"""Experiment: unroll-by-2 flash forward — expose independent MXU/VPU work."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

def _fwd_kernel_u2(klen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, scale, lq_total, lk_total, block_q, block_k,
                   num_k2, precision):
    iq, ik2 = pl.program_id(2), pl.program_id(3)
    k_len = klen_ref[pl.program_id(0)]

    @pl.when(ik2 == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k2 = k_ref[0]                       # [2bk, D]
    v2 = v_ref[0]

    def mask_for(base_col):
        k_idx = base_col + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        return k_idx < k_len

    # two independent dots — the scheduler may overlap softmax(s0) with
    # the s1 MXU time and softmax(s1) with pv0
    s0 = jax.lax.dot_general(q, k2[:block_k], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision) * scale
    s1 = jax.lax.dot_general(q, k2[block_k:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision) * scale
    base = ik2 * 2 * block_k
    s0 = jnp.where(mask_for(base), s0, NEG_INF)
    s1 = jnp.where(mask_for(base + block_k), s1, NEG_INF)

    m_prev = m_ref[:, 0]
    m0 = jnp.maximum(m_prev, jnp.max(s0, axis=-1))
    a0 = jnp.exp(m_prev - m0)
    p0 = jnp.exp(s0 - m0[:, None])
    pv0 = jax.lax.dot_general(p0.astype(v2.dtype), v2[:block_k],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)
    m1 = jnp.maximum(m0, jnp.max(s1, axis=-1))
    a1 = jnp.exp(m0 - m1)
    p1 = jnp.exp(s1 - m1[:, None])
    pv1 = jax.lax.dot_general(p1.astype(v2.dtype), v2[block_k:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)

    l_cur = (l_ref[:, 0] * a0 + jnp.sum(p0, -1)) * a1 + jnp.sum(p1, -1)
    acc_ref[:] = ((acc_ref[:] * a0[:, None] + pv0) * a1[:, None] + pv1)
    m_ref[:] = jnp.broadcast_to(m1[:, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_cur[:, None], l_ref.shape)

    @pl.when(ik2 == num_k2 - 1)
    def _finalize():
        l = l_ref[:, 0]
        valid = m_ref[:, 0] > NEG_INF * 0.5
        denom = jnp.where(l == 0.0, 1.0, l)
        o = acc_ref[:] / denom[:, None]
        o_ref[0] = jnp.where(valid[:, None], o, 0.0).astype(o_ref.dtype)


def flash_u2(q, k, v, k_lens, scale, block_q, block_k, head_dim,
             precision=jax.lax.Precision.DEFAULT, interpret=False):
    b, lq, nd = q.shape
    lk = k.shape[1]
    d = head_dim
    n = nd // d
    nq, nk2 = lq // block_q, lk // (2 * block_k)
    kernel = functools.partial(
        _fwd_kernel_u2, scale=scale, lq_total=lq, lk_total=lk,
        block_q=block_q, block_k=block_k, num_k2=nk2, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk2),
        in_specs=[
            pl.BlockSpec((b,), lambda b_, n_, iq, ik: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, n_, iq, ik: (b_, iq, n_)),
            pl.BlockSpec((1, 2 * block_k, d),
                         lambda b_, n_, iq, ik: (b_, ik, n_)),
            pl.BlockSpec((1, 2 * block_k, d),
                         lambda b_, n_, iq, ik: (b_, ik, n_)),
        ],
        out_specs=[pl.BlockSpec((1, block_q, d),
                                lambda b_, n_, iq, ik: (b_, iq, n_))],
        out_shape=[jax.ShapeDtypeStruct((b, lq, nd), q.dtype)],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n * lq * lk),
        interpret=interpret,
    )(k_lens, q, k, v)[0]


if __name__ == "__main__":
    from omnihuman_tpu.ops import flash_pallas as fp
    B, L, N, D = 2, 32768, 12, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, N*D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, N*D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, N*D)), jnp.bfloat16)
    klens = jnp.asarray([L, L - 100], jnp.int32)
    scale = D ** -0.5
    prec = jax.lax.Precision.DEFAULT

    ref_f = jax.jit(lambda q,k,v: fp._flash_fwd_nd(
        q, k, v, klens, scale, False, (-1,-1), 1024, 1024, False, prec,
        False, D)[0])
    ref = ref_f(q, k, v); jax.block_until_ready(ref)

    def bench(fn, name, iters=20):
        f = jax.jit(fn)
        out = f(q, k, v); jax.block_until_ready(out)
        err = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        t0 = time.perf_counter()
        for _ in range(iters): out = f(q, k, v)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:7.2f} ms  {4*B*N*L*L*D/dt/1e9:6.1f} TFLOP/s  maxerr {err:.5f}", flush=True)

    bench(lambda q,k,v: ref_f(q,k,v), "standard 1024x1024")
    for bq, bk in [(1024, 512), (512, 512), (1024, 1024), (512, 1024), (2048, 512)]:
        try:
            bench(lambda q,k,v,bq=bq,bk=bk: flash_u2(
                q, k, v, klens, scale, bq, bk, D), f"unroll2 {bq}x{bk}")
        except Exception as e:
            print(f"unroll2 {bq}x{bk}: FAIL {str(e)[:120]}", flush=True)
