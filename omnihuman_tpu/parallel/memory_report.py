"""AOT memory / compile validation for large configs (SURVEY §7.3 hard
part 5: "14B is the model the mesh exists for").

Lowers + compiles jitted steps ABSTRACTLY (ShapeDtypeStruct inputs — no
parameters are ever materialised) over a (data, fsdp, sp) mesh and reads
XLA's `compiled.memory_analysis()`: per-device argument/output/temp sizes
and the resulting peak. This answers "does the i2v-14B CFG step / APT
G-step fit v5e HBM at this mesh shape, with this remat policy?" without
owning a pod slice.

Two backends:
  - backend="tpu" (default): compiles against a CHIPLESS v5e topology
    (jax.experimental.topologies) — the real TPU compiler, the real
    Pallas/ring attention kernels, real bf16 buffer layouts; no chips
    needed. These are the authoritative numbers.
  - backend="cpu": virtual host devices
    (--xla_force_host_platform_device_count). Portable, but XLA:CPU
    widens bf16 to f32 internally, so weight-gather temps read ~2x too
    high; attention is analysed through `attention_xla_chunked`
    (ops/attention.py) so at least the temp memory reflects the
    O(block) flash behaviour rather than the dense [B, N, L, L] path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omnihuman_tpu.configs import WAN_CONFIGS
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.parallel.mesh import MeshConfig, create_mesh, use_mesh
from omnihuman_tpu.parallel.partition import infer_param_specs

V5E_HBM_BYTES = 16 * 1024 ** 3          # 16 GiB per v5e chip

# chipless topology names accepted by the libtpu PJRT plugin, per slice
# size (the plugin's chips_per_host_bounds is 2x2, so 2x2 is the minimum
# describable slice — smaller meshes slice its device list)
V5E_TOPOLOGIES = {4: "v5e:2x2", 8: "v5e:2x4", 16: "v5e:4x4",
                  32: "v5e:4x8", 64: "v5e:8x8", 128: "v5e:8x16",
                  256: "v5e:16x16"}


def topology_mesh(mesh_shape: Dict[str, int],
                  topology: Optional[str] = None) -> Mesh:
    """(data, fsdp, sp) mesh over a CHIPLESS v5e topology — lets the real
    TPU compiler do the AOT analysis without owning the slice."""
    from jax.experimental import topologies

    n = int(np.prod(list(mesh_shape.values())))
    if topology is None:
        # smallest describable topology that covers n; slice its devices
        fits = [k for k in sorted(V5E_TOPOLOGIES) if k >= n]
        if not fits:
            raise ValueError(
                f"mesh needs {n} devices — beyond the largest known "
                f"chipless v5e topology ({max(V5E_TOPOLOGIES)}); pass "
                f"topology= explicitly")
        topology = V5E_TOPOLOGIES[fits[0]]
    topo = topologies.get_topology_desc(topology, "tpu")
    return create_mesh(MeshConfig(**mesh_shape),
                       devices=list(topo.devices)[:n])


def _compile_stats(lowered) -> Dict[str, float]:
    """compile + memory stats; the TPU compiler raises RESOURCE_EXHAUSTED
    instead of returning stats when the program exceeds HBM — catch it and
    report the attempted usage ("Used 16.75G of 15.75G hbm")."""
    import re
    try:
        return _stats_dict(lowered.compile())
    except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
        msg = str(e)
        if "RESOURCE_EXHAUSTED" not in msg:
            raise
        m = re.search(r"Used ([0-9.]+)([MG]) of", msg)
        used = float("nan")
        if m:
            used = float(m.group(1)) * (1024 ** (3 if m.group(2) == "G"
                                                 else 2))
        return {"argument_bytes": float("nan"),
                "output_bytes": float("nan"),
                "temp_bytes": float("nan"), "alias_bytes": 0.0,
                "peak_bytes": used, "peak_gib": used / 1024 ** 3,
                "oom": True}


def _stats_dict(compiled) -> Dict[str, float]:
    ma = compiled.memory_analysis()
    out = {
        "argument_bytes": float(ma.argument_size_in_bytes),
        "output_bytes": float(ma.output_size_in_bytes),
        "temp_bytes": float(ma.temp_size_in_bytes),
        "alias_bytes": float(ma.alias_size_in_bytes),
    }
    # live peak: arguments stay resident, outputs + temps are allocated on
    # top; aliased (donated) buffers are not double-counted
    out["peak_bytes"] = (out["argument_bytes"] + out["output_bytes"]
                         + out["temp_bytes"] - out["alias_bytes"])
    out["peak_gib"] = out["peak_bytes"] / 1024 ** 3
    return out


def _shardings(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        infer_param_specs(tree, axis_size=mesh.shape.get("fsdp")))


def latent_geometry(cfg, size: Tuple[int, int], frame_num: int):
    """(latent_shape, grid, n_tokens) for a (W, H) pixel size."""
    w, h = size
    f = (frame_num - 1) // cfg.vae_stride[0] + 1
    lat = (cfg.vae.z_dim, f, h // cfg.vae_stride[1], w // cfg.vae_stride[2])
    pt, ph, pw = cfg.model.patch_size
    grid = (f // pt if pt > 1 else f, lat[2] // ph, lat[3] // pw)
    return lat, grid, grid[0] * grid[1] * grid[2]


def analyze_cfg_step(
    task: str = "i2v-14B",
    size: Tuple[int, int] = (1280, 720),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    attn_impl: Optional[str] = None,
    remat: bool = False,
    fused_cfg: bool = True,
    policy=None,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the classifier-free-guidance denoise step (the
    pipeline's hot loop, pipelines/text2video.py) and report per-device
    memory. fused_cfg=True batches cond+uncond in one 2B forward (max
    throughput); False analyses the sequential variant (half the
    activation footprint — the reference runs cond/uncond separately,
    text2video.py:218-243)."""
    cfg = WAN_CONFIGS[task]
    policy = policy or cfg.policy
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 4, "sp": 2}
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or "ring"     # shard_map ring + Pallas
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    seq_len = int(math.ceil(n_tokens / sp) * sp)
    i2v = cfg.model.model_type == "i2v"

    def abstract(shape, dtype=jnp.bfloat16):
        return jax.ShapeDtypeStruct(shape, dtype)

    params_shape = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            wan_dit.init_wan_model(jax.random.key(0), cfg.model)))

    token_sharding = NamedSharding(mesh, P(None, "sp", None))

    def fwd(params, x, t, ctx, y, clip_fea, sin, cos):
        kw = {"y": y, "clip_fea": clip_fea} if i2v else {}
        return wan_dit.wan_model_forward(
            params, x, t, ctx, cfg=cfg.model, seq_len=seq_len,
            rope_sin=sin, rope_cos=cos, policy=policy, remat=remat,
            attn_impl=attn_impl, token_sharding=token_sharding, **kw)

    def cfg_step(params, x, t, ctx, ctx_null, y, clip_fea, sin, cos):
        if fused_cfg:
            cat = lambda a: jnp.concatenate([a, a], axis=0)
            v = fwd(params, cat(x), cat(t),
                    jnp.concatenate([ctx, ctx_null], axis=0),
                    cat(y) if i2v else y, cat(clip_fea) if i2v else clip_fea,
                    sin, cos)
            v_c, v_u = jnp.split(v, 2, axis=0)
        else:
            v_c = fwd(params, x, t, ctx, y, clip_fea, sin, cos)
            v_u = fwd(params, x, t, ctx_null, y, clip_fea, sin, cos)
        return v_u + cfg.sample_guide_scale * (v_c - v_u)

    x_s = abstract((batch,) + lat)
    t_s = abstract((batch,), jnp.float32)
    ctx_s = abstract((batch, cfg.text_len, cfg.t5.dim))
    y_s = abstract((batch, cfg.model.in_dim - cfg.vae.z_dim) + lat[1:])
    clip_s = abstract((batch, cfg.model.clip_tokens, cfg.model.clip_embed_dim)
                      ) if i2v else abstract((batch, 1, 1))
    # rope tables as abstract args (concrete closures would pin the trace
    # to the live backend, breaking chipless-topology lowering)
    sin_s, cos_s = jax.eval_shape(
        lambda: rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len))

    repl = NamedSharding(mesh, P())
    in_shardings = (_shardings(mesh, params_shape),
                    repl, repl, repl, repl, repl, repl, repl, repl)
    jitted = jax.jit(cfg_step, in_shardings=in_shardings)
    with use_mesh(mesh):
        lowered = jitted.lower(params_shape, x_s, t_s, ctx_s, ctx_s, y_s,
                               clip_s, sin_s, cos_s)
        stats = _compile_stats(lowered)
    stats.update(task=task, step="cfg_denoise", mesh=dict(mesh_shape),
                 seq_len=seq_len, n_tokens=n_tokens, batch=batch,
                 size=list(size), frame_num=frame_num, remat=remat,
                 attn_impl=attn_impl, fused_cfg=fused_cfg,
                 fits_v5e=(stats["peak_bytes"] < V5E_HBM_BYTES
                           and not stats.get("oom", False)))
    return stats


def analyze_pipeline_cfg_step(
    task: str = "i2v-14B",
    size: Tuple[int, int] = (1280, 720),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    cfg_mode: str = "sequential",
    attn_impl: Optional[str] = None,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the ACTUAL pipeline step function — the very
    `_cfg_model_step` / `_i2v_cfg_model_step` jitted callables the
    pipelines execute in their denoise loop — and report per-device
    memory. Unlike `analyze_cfg_step` (a reconstruction), this validates
    the user-facing code path `cli/generate.py --sp_size/--fsdp_size`
    compiles and fits (VERDICT r2 missing #1)."""
    from omnihuman_tpu.pipelines import image2video, text2video

    cfg = WAN_CONFIGS[task]
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 4, "sp": 2}
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or "ring"
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    # replicate WanT2V.seq_len_for: sp-divisible, 1024-block aligned at
    # flagship lengths
    align = int(np.lcm(sp, 1024)) if n_tokens >= 4096 else sp
    seq_len = int(math.ceil(n_tokens / align) * align)
    i2v = cfg.model.model_type == "i2v"

    params_shape = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            wan_dit.init_wan_model(jax.random.key(0), cfg.model)))
    params_abs = jax.tree.map(
        lambda s, spec: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec)),
        params_shape,
        infer_param_specs(params_shape, axis_size=mesh.shape.get("fsdp")))

    repl = NamedSharding(mesh, P())
    ab = lambda shape, dtype=jnp.float32: jax.ShapeDtypeStruct(
        shape, dtype, sharding=repl)
    x_s = ab((batch,) + lat)
    t_s = ab((), jnp.float32)
    ctx2_s = ab((2 * batch, cfg.text_len, cfg.t5.dim), jnp.bfloat16)
    sin_sh, cos_sh = jax.eval_shape(
        lambda: rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len))
    sin_s = ab(sin_sh.shape, sin_sh.dtype)
    cos_s = ab(cos_sh.shape, cos_sh.dtype)

    token_sharding = NamedSharding(mesh, P(None, "sp", None))
    statics = dict(model_cfg=cfg.model, policy=cfg.policy, seq_len=seq_len,
                   guide_scale=float(cfg.sample_guide_scale),
                   attn_impl=attn_impl, token_sharding=token_sharding,
                   cfg_mode=cfg_mode)

    with use_mesh(mesh):
        if i2v:
            y2_s = ab((2 * batch, cfg.model.in_dim - cfg.vae.z_dim)
                      + lat[1:])
            clip2_s = ab((2 * batch, cfg.model.clip_tokens,
                          cfg.model.clip_embed_dim), jnp.bfloat16)
            lowered = image2video._i2v_cfg_model_step.lower(
                params_abs, x_s, t_s, ctx2_s, y2_s, clip2_s, sin_s, cos_s,
                **statics)
        else:
            lowered = text2video._cfg_model_step.lower(
                params_abs, x_s, t_s, ctx2_s, sin_s, cos_s, **statics)
        stats = _compile_stats(lowered)
    stats.update(task=task, step="pipeline_cfg_denoise",
                 mesh=dict(mesh_shape), seq_len=seq_len, n_tokens=n_tokens,
                 batch=batch, size=list(size), frame_num=frame_num,
                 attn_impl=attn_impl, cfg_mode=cfg_mode,
                 fits_v5e=(stats["peak_bytes"] < V5E_HBM_BYTES
                           and not stats.get("oom", False)))
    return stats


def analyze_distill_step(
    task: str = "t2v-1.3B",
    size: Tuple[int, int] = (832, 480),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    attn_impl: Optional[str] = None,
    remat=True,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the stage-1 consistency-distillation train step
    (apt/distill.py distill_train_step — fwd + bwd + AdamW + on-device
    EMA; reference seaweed_apt/distilled_trainer.py:241-334) and report
    per-device memory.

    A mesh with all axes == 1 analyses the plain single-chip program
    (attn_impl='pallas', no token sharding) — the exact geometry the
    on-chip training bench runs; larger meshes use the ring/sp path."""
    from omnihuman_tpu.apt.distill import (
        distill_train_step, init_distill_state, make_optimizer)

    cfg = WAN_CONFIGS[task]
    if (isinstance(remat, int) and not isinstance(remat, bool)
            and remat > 1 and cfg.model.num_layers % remat != 0):
        remat = True                    # per-block, always valid
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 1, "sp": 1}
    n_dev = int(np.prod(list(mesh_shape.values())))
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or ("pallas" if n_dev == 1 else "ring")
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    align = int(np.lcm(sp, 1024)) if n_tokens >= 4096 else max(sp, 1)
    seq_len = int(math.ceil(n_tokens / align) * align)
    sin, cos = jax.eval_shape(
        lambda: rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len))
    optimizer = make_optimizer()

    def abstract_state():
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            wan_dit.init_wan_model(jax.random.key(0), cfg.model))
        return init_distill_state(params, optimizer)

    state_shape = jax.eval_shape(abstract_state)
    state_sh = _shardings(mesh, state_shape)

    b = batch
    batch_s = {
        "noise": jax.ShapeDtypeStruct((b,) + lat, jnp.float32),
        "v_teacher": jax.ShapeDtypeStruct((b,) + lat, jnp.float32),
        "context": jax.ShapeDtypeStruct((b, cfg.text_len, cfg.t5.dim),
                                        jnp.bfloat16),
    }
    repl = NamedSharding(mesh, P())
    batch_sh = jax.tree.map(lambda _: repl, batch_s)
    token_sharding = (NamedSharding(mesh, P(None, "sp", None))
                      if sp > 1 else None)

    def step(state, batch, sin, cos):
        return distill_train_step(
            state, batch, optimizer=optimizer, cfg=cfg.model,
            seq_len=seq_len, rope_sin=sin, rope_cos=cos,
            policy=cfg.policy, remat=remat, attn_impl=attn_impl,
            token_sharding=token_sharding)

    jitted = jax.jit(step, in_shardings=(state_sh, batch_sh, repl, repl),
                     donate_argnums=(0,))
    with use_mesh(mesh):
        lowered = jitted.lower(state_shape, batch_s, sin, cos)
        stats = _compile_stats(lowered)
    stats.update(task=f"distill-{task}", step="distill_train",
                 mesh=dict(mesh_shape), seq_len=seq_len,
                 n_tokens=n_tokens, batch=batch, size=list(size),
                 frame_num=frame_num, remat=remat, attn_impl=attn_impl,
                 fits_v5e=(stats["peak_bytes"] < V5E_HBM_BYTES
                           and not stats.get("oom", False)))
    return stats


def analyze_apt_steps(
    task: str = "i2v-14B",
    size: Tuple[int, int] = (1280, 720),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    attn_impl: Optional[str] = None,
    remat=True,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the APT discriminator and generator update steps
    (apt/apt_trainer.py) at scale and report per-device memory.
    remat: True = per-block; int g = grouped two-level remat."""
    import optax

    from omnihuman_tpu.apt.apt_trainer import (
        SeaweedAPTConfig, apt_d_step, apt_g_step, init_apt_state,
        make_d_optimizer, make_rmsprop)
    from omnihuman_tpu.apt.model import init_apt_discriminator

    cfg = WAN_CONFIGS[task]
    apt_cfg = SeaweedAPTConfig()
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 8, "sp": 2}
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or "ring"
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    seq_len = int(math.ceil(n_tokens / sp) * sp)
    sin, cos = jax.eval_shape(
        lambda: rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len))

    def abstract_state():
        bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        params = bf16(wan_dit.init_wan_model(jax.random.key(0), cfg.model))
        d_params = init_apt_discriminator(jax.random.key(1), params,
                                          cfg.model)
        return init_apt_state(params, d_params, apt_cfg.g_lr_image,
                              apt_cfg.d_lr_image)

    state_shape = jax.eval_shape(abstract_state)
    d_opt = make_d_optimizer(apt_cfg.d_lr_image,
                             state_shape.d_params)
    g_opt = make_rmsprop(apt_cfg.g_lr_image)

    b = batch
    batch_s = {
        "real": jax.ShapeDtypeStruct((b,) + lat, jnp.bfloat16),
        "noise": jax.ShapeDtypeStruct((b,) + lat, jnp.bfloat16),
        "context": jax.ShapeDtypeStruct((b, cfg.text_len, cfg.t5.dim),
                                        jnp.bfloat16),
    }
    repl = NamedSharding(mesh, P())
    state_sh = _shardings(mesh, state_shape)
    batch_sh = jax.tree.map(lambda _: repl, batch_s)

    kw = dict(cfg=cfg.model, apt_cfg=apt_cfg, video=frame_num > 1,
              seq_len=seq_len, policy=cfg.policy, attn_impl=attn_impl,
              token_sharding=NamedSharding(mesh, P(None, "sp", None)))

    out = {"task": task, "mesh": dict(mesh_shape), "seq_len": seq_len,
           "batch": batch, "size": list(size), "frame_num": frame_num,
           "remat": remat}
    key_abs = jax.eval_shape(lambda: jax.random.key(0))
    for name, fn, opt in (("d_step", apt_d_step, {"d_optimizer": d_opt}),
                          ("g_step", apt_g_step,
                           {"g_optimizer": g_opt, "remat": remat})):
        step = functools.partial(fn, **kw, **opt)
        jitted = jax.jit(
            lambda state, batch, key, sin, cos, step=step:
                step(state, batch, key, rope_sin=sin, rope_cos=cos),
            in_shardings=(state_sh, batch_sh, repl, repl, repl),
            donate_argnums=(0,))
        with use_mesh(mesh):
            lowered = jitted.lower(state_shape, batch_s, key_abs, sin, cos)
            stats = _compile_stats(lowered)
        stats["fits_v5e"] = (stats["peak_bytes"] < V5E_HBM_BYTES
                             and not stats.get("oom", False))
        out[name] = stats
    return out


def analyze_omni_step(
    task: str = "t2v-14B",
    size: Tuple[int, int] = (832, 480),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    attn_impl: Optional[str] = None,
    remat=8,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the OmniHuman conditioned training step at scale
    (BASELINE.json configs[4]: full omni-conditions on the 14B backbone,
    sharded mesh) and report per-device memory. The packed sequence is
    video + reference tokens with the sp/flash-block padding rule
    (omni/model.py seq_align)."""
    from omnihuman_tpu.omni.model import OmniModelConfig, init_omni_model
    from omnihuman_tpu.omni.trainer import (
        OmniTrainState, make_lr_schedule, make_omni_optimizer,
        omni_train_step)

    cfg = WAN_CONFIGS[task]
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 16, "sp": 2}
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or "ring"
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    f_lat, lat_h, lat_w = lat[1:]
    ocfg = OmniModelConfig(base=cfg.model, audio_dim=1024,
                           num_keypoints=308, num_frames=f_lat)
    optimizer = make_omni_optimizer(make_lr_schedule("cosine", 1e-4, 1000))

    def abstract_state():
        bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        params = bf16(init_omni_model(jax.random.key(0), ocfg))
        return OmniTrainState(params=params,
                              opt_state=optimizer.init(params),
                              step=jnp.asarray(0, jnp.int32))

    state_shape = jax.eval_shape(abstract_state)
    state_sh = _shardings(mesh, state_shape)

    b = batch
    batch_s = {
        "frames": jax.ShapeDtypeStruct((b,) + lat, jnp.float32),
        "context": jax.ShapeDtypeStruct((b, cfg.text_len, cfg.t5.dim),
                                        jnp.bfloat16),
        "reference": jax.ShapeDtypeStruct((b, lat[0], 1, lat_h, lat_w),
                                          jnp.float32),
        "audio": jax.ShapeDtypeStruct((b, f_lat, ocfg.audio_dim),
                                      jnp.float32),
        "pose": jax.ShapeDtypeStruct(
            (b, ocfg.num_keypoints, f_lat, 2 * lat_h, 2 * lat_w),
            jnp.bfloat16),
    }
    repl = NamedSharding(mesh, P())
    batch_sh = jax.tree.map(lambda _: repl, batch_s)
    # pose heatmaps shard H over sp (matches TrainMeshPlan.put_batch —
    # replicated fp32 pose alone is ~6.4 GiB at 480p·81f, the original
    # OOM driver of this analysis)
    if sp > 1 and (2 * lat_h) % sp == 0:
        batch_sh["pose"] = NamedSharding(
            mesh, P(None, None, None, "sp", None))
    key_abs = jax.eval_shape(lambda: jax.random.key(0))
    ratios = {"audio": 1.0, "pose": 1.0, "reference": 1.0}
    token_sharding = NamedSharding(mesh, P(None, "sp", None))

    def step(state, batch, key):
        return omni_train_step(
            state, batch, ratios, key, optimizer=optimizer, cfg=ocfg,
            policy=cfg.policy, remat=remat, attn_impl=attn_impl,
            token_sharding=token_sharding, seq_align=sp)

    jitted = jax.jit(step, in_shardings=(state_sh, batch_sh, repl),
                     donate_argnums=(0,))
    with use_mesh(mesh):
        lowered = jitted.lower(state_shape, batch_s, key_abs)
        stats = _compile_stats(lowered)
    stats.update(task=f"omni-{task}", step="omni_train", remat=remat,
                 mesh=dict(mesh_shape), n_video_tokens=n_tokens,
                 batch=batch, size=list(size), frame_num=frame_num,
                 attn_impl=attn_impl,
                 fits_v5e=(stats["peak_bytes"] < V5E_HBM_BYTES
                           and not stats.get("oom", False)))
    return stats


def analyze_omni_pipeline(
    task: str = "t2v-14B",
    size: Tuple[int, int] = (832, 480),
    frame_num: int = 81,
    mesh_shape: Dict[str, int] = None,
    batch: int = 1,
    motion_frames: int = 2,
    attn_impl: Optional[str] = None,
    backend: str = "tpu",
    devices=None,
) -> Dict[str, Any]:
    """AOT-compile the omni SERVING step (one CFG-annealed sampling
    iteration of `pipelines/omni.omni_generate`: conditioned + uncond
    forward, sequential CFG) at 14B scale with PACKED reference+motion
    tokens — which make the self-attention sequence LONGER than the
    validated plain-i2v pipeline rows (VERDICT r3 item 4)."""
    from omnihuman_tpu.configs.wan import DTypePolicy
    from omnihuman_tpu.omni.model import (OmniModelConfig, init_omni_model,
                                          omni_model_forward)

    cfg = WAN_CONFIGS[task]
    mesh_shape = mesh_shape or {"data": 1, "fsdp": 4, "sp": 2}
    if backend == "tpu" and devices is None:
        mesh = topology_mesh(mesh_shape)
        attn_impl = attn_impl or "ring"
    else:
        mesh = create_mesh(MeshConfig(**mesh_shape), devices=devices)
        attn_impl = attn_impl or "xla_chunked"
    sp = mesh.shape.get("sp", 1)

    lat, grid, n_tokens = latent_geometry(cfg, size, frame_num)
    f_lat, lat_h, lat_w = lat[1:]
    ocfg = OmniModelConfig(base=cfg.model, audio_dim=1024,
                           num_keypoints=308, num_frames=f_lat)
    # packed sequence: video + 1 ref frame + M motion frames of tokens
    tokens_per_frame = n_tokens // f_lat
    packed_tokens = n_tokens + (1 + motion_frames) * tokens_per_frame

    bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), t)
    params_s = bf16(jax.eval_shape(
        lambda: init_omni_model(jax.random.key(0), ocfg)))
    params_sh = _shardings(mesh, params_s)

    b = batch
    abstract = lambda shape, dt=jnp.bfloat16: jax.ShapeDtypeStruct(  # noqa
        shape, dt)
    inputs_s = dict(
        x=abstract((b,) + lat, jnp.float32),
        ctx=abstract((b, cfg.text_len, cfg.t5.dim)),
        ctx_null=abstract((b, cfg.text_len, cfg.t5.dim)),
        audio=abstract((b, f_lat, ocfg.audio_dim), jnp.float32),
        pose=abstract((b, ocfg.num_keypoints, f_lat, 2 * lat_h, 2 * lat_w)),
        ref=abstract((b, lat[0], 1, lat_h, lat_w), jnp.float32),
        motion=abstract((b, lat[0], motion_frames, lat_h, lat_w),
                        jnp.float32),
    )
    repl = NamedSharding(mesh, P())
    inputs_sh = jax.tree.map(lambda _: repl, inputs_s)
    if sp > 1 and (2 * lat_h) % sp == 0:
        inputs_sh["pose"] = NamedSharding(
            mesh, P(None, None, None, "sp", None))
    token_sharding = NamedSharding(mesh, P(None, "sp", None))

    def cfg_annealed_step(params, d):
        tb = jnp.full((b,), 999.0, jnp.float32)
        kw = dict(cfg=ocfg, policy=cfg.policy, remat=False,
                  attn_impl=attn_impl, token_sharding=token_sharding,
                  seq_align=sp)
        v_c = omni_model_forward(params, d["x"], tb, d["ctx"],
                                 audio=d["audio"], pose=d["pose"],
                                 ref_latent=d["ref"],
                                 motion_latent=d["motion"], **kw)
        v_u = omni_model_forward(params, d["x"], tb, d["ctx_null"], **kw)
        return v_u + 5.0 * (v_c - v_u)

    jitted = jax.jit(cfg_annealed_step, in_shardings=(params_sh, inputs_sh))
    with use_mesh(mesh):
        lowered = jitted.lower(params_s, inputs_s)
        stats = _compile_stats(lowered)
    stats.update(task=f"omni-serve-{task}", step="omni_cfg_annealed",
                 mesh=dict(mesh_shape), n_video_tokens=n_tokens,
                 n_packed_tokens=packed_tokens, motion_frames=motion_frames,
                 batch=batch, size=list(size), frame_num=frame_num,
                 attn_impl=attn_impl,
                 fits_v5e=(stats["peak_bytes"] < V5E_HBM_BYTES
                           and not stats.get("oom", False)))
    return stats


def main(argv=None):  # pragma: no cover - exercised by the report script
    import argparse
    import json

    # The analyses compile against an abstract topology; nothing needs a
    # live device. Pin the default backend to CPU so stray eager ops
    # can't init the axon TPU plugin — during a tunnel outage that init
    # hangs indefinitely (observed 2026-08-18), defeating the tool's
    # chipless purpose.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    p = argparse.ArgumentParser("memory-report")
    p.add_argument("--task", default="i2v-14B")
    p.add_argument("--what", default="cfg",
                   choices=["cfg", "apt", "pipeline", "omni",
                            "omni_pipeline", "distill"])
    p.add_argument("--motion_frames", type=int, default=2,
                   help="packed motion-latent frames for "
                        "--what omni_pipeline")
    p.add_argument("--cfg_mode", default="sequential",
                   choices=["fused", "sequential"],
                   help="CFG execution for --what pipeline")
    p.add_argument("--size", default="1280*720")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--mesh", default="data:1,fsdp:4,sp:2")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--remat", type=int, default=8,
                   help="remat group size for --what omni (int groups; "
                        "the wan remat ladder, wan_dit.py)")
    args = p.parse_args(argv)
    w, h = (int(v) for v in args.size.replace("x", "*").split("*"))
    mesh_shape = {k: int(v) for k, v in
                  (kv.split(":") for kv in args.mesh.split(","))}
    if args.what == "cfg":
        stats = analyze_cfg_step(args.task, (w, h), args.frame_num,
                                 mesh_shape, args.batch,
                                 remat=not args.no_remat)
    elif args.what == "pipeline":
        stats = analyze_pipeline_cfg_step(args.task, (w, h), args.frame_num,
                                          mesh_shape, args.batch,
                                          cfg_mode=args.cfg_mode)
    elif args.what == "omni":
        stats = analyze_omni_step(args.task, (w, h), args.frame_num,
                                  mesh_shape, args.batch, remat=args.remat)
    elif args.what == "omni_pipeline":
        stats = analyze_omni_pipeline(args.task, (w, h), args.frame_num,
                                      mesh_shape, args.batch,
                                      motion_frames=args.motion_frames)
    elif args.what == "distill":
        stats = analyze_distill_step(args.task, (w, h), args.frame_num,
                                     mesh_shape, args.batch,
                                     remat=args.remat if args.remat > 1
                                     else not args.no_remat)
    else:
        stats = analyze_apt_steps(args.task, (w, h), args.frame_num,
                                  mesh_shape, args.batch)
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":  # pragma: no cover
    main()
