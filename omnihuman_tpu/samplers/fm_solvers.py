"""Flow-matching multistep solvers (UniPC + DPM-Solver++) as pure steppers.

Capability parity with the reference's diffusers-derived schedulers:
  - FlowUniPCMultistepScheduler (wan/utils/fm_solvers_unipc.py:20-799):
    predictor-corrector B(h) updates on x0 predictions, solver_order 2,
    bh2, lower_order_final warm-up/cool-down, flow prediction
    x0 = sample - sigma * v with alpha_t = 1 - sigma (":272-274").
  - FlowDPMSolverMultistepScheduler (wan/utils/fm_solvers.py:69-857):
    dpmsolver++ data-prediction multistep (midpoint 2nd order, 3rd order
    optional), same flow conversion.
  - get_sampling_sigmas / retrieve_timesteps (fm_solvers.py:22-35).

TPU-first redesign (SURVEY §7.1 'samplers as pure step functions'):
The reference schedulers are stateful Python objects whose every step
recomputes scalar coefficient algebra on device tensors. Here the sigma
schedule is STATIC, so every scalar (lambda, h, r, rho, B_h ...) is
precomputed host-side in float64 numpy at plan() time and baked into
[steps, ...] coefficient tables. The device-side step is a handful of
fused multiply-adds over the latent plus a short x0-prediction history —
jit/scan friendly, no data-dependent control flow, no host sync per step.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# schedule helpers (fm_solvers.py:22-35)


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """sigma = linspace(1, 0)[:-1] warped by shift*s/(1+(shift-1)s)."""
    sigma = np.linspace(1.0, 0.0, sampling_steps + 1)[:sampling_steps]
    return (shift * sigma / (1.0 + (shift - 1.0) * sigma)).astype(np.float64)


def retrieve_timesteps(num_inference_steps: int, shift: float,
                       num_train_timesteps: int = 1000
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps, sigmas_with_final_zero) for a shifted linear schedule."""
    sigmas = get_sampling_sigmas(num_inference_steps, shift)
    timesteps = sigmas * num_train_timesteps
    return timesteps, np.concatenate([sigmas, [0.0]])


def _lam(sigma: np.ndarray) -> np.ndarray:
    """lambda = log(alpha) - log(sigma), alpha = 1 - sigma (flow matching)."""
    with np.errstate(divide="ignore"):
        return np.log(np.maximum(1.0 - sigma, 1e-300)) - np.log(
            np.maximum(sigma, 1e-300))


# ---------------------------------------------------------------------------
# coefficient plans


@dataclasses.dataclass(frozen=True)
class SolverPlan:
    """Per-step coefficient tables (numpy, baked as jit constants).

    All arrays have leading dim [steps]; K = solver_order.
      pred_x, pred_m0, pred_bh : predictor scalars
      pred_rho [steps, K-1], pred_rk [steps, K-1] : D1 weights (0/1-padded)
      corr_* : corrector scalars (UniPC only; zeros for DPM)
      corr_rho_last : weight of (x0_t - m0) in the corrector
      use_corrector : 0/1 per step
    """

    kind: str
    steps: int
    order: int
    sigmas: np.ndarray          # [steps+1]
    timesteps: np.ndarray       # [steps]
    pred_x: np.ndarray
    pred_m0: np.ndarray
    pred_bh: np.ndarray
    pred_rho: np.ndarray
    pred_rk: np.ndarray
    corr_x: np.ndarray
    corr_m0: np.ndarray
    corr_bh: np.ndarray
    corr_rho: np.ndarray
    corr_rk: np.ndarray
    corr_rho_last: np.ndarray
    use_corrector: np.ndarray


def _unipc_rhos(rks: List[float], hh: float, order: int, solver_type: str,
                corrector: bool) -> Tuple[np.ndarray, float]:
    """Solve the B(h) linear system (fm_solvers_unipc.py:430-466,575-607).

    Returns (rho_d1 weights for the history D1 terms, rho_last for the
    corrector's (m_t - m0) term; rho_last = 0 for the predictor).
    """
    rks = np.asarray(rks + [1.0])
    h_phi_1 = np.expm1(hh)
    b_h = hh if solver_type == "bh1" else np.expm1(hh)

    R, b = [], []
    h_phi_k = h_phi_1 / hh - 1.0
    fact = 1
    for i in range(1, order + 1):
        R.append(np.power(rks, i - 1))
        b.append(h_phi_k * fact / b_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    R = np.stack(R)
    b = np.asarray(b)

    if corrector:
        if order == 1:
            rhos = np.asarray([0.5])
        else:
            rhos = np.linalg.solve(R, b)
        return rhos[:-1], float(rhos[-1])
    else:
        if order == 2:
            rhos = np.asarray([0.5])
        elif order == 1:
            rhos = np.zeros((0,))
        else:
            rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
        return rhos, 0.0


def plan_unipc(steps: int, shift: float, order: int = 2,
               solver_type: str = "bh2", num_train_timesteps: int = 1000,
               lower_order_final: bool = True,
               disable_corrector: Tuple[int, ...] = ()) -> SolverPlan:
    timesteps, sig = retrieve_timesteps(steps, shift, num_train_timesteps)
    lam = _lam(sig)
    K = order

    z = np.zeros(steps)
    zk = np.zeros((steps, max(K - 1, 1)))
    ok = np.ones((steps, max(K - 1, 1)))
    p_x, p_m0, p_bh = z.copy(), z.copy(), z.copy()
    p_rho, p_rk = zk.copy(), ok.copy()
    c_x, c_m0, c_bh = z.copy(), z.copy(), z.copy()
    c_rho, c_rk = zk.copy(), ok.copy()
    c_rl, use_c = z.copy(), z.copy()

    prev_order = 1
    for i in range(steps):
        # effective order (fm_solvers_unipc.py:706-716): warm-up via
        # lower_order_nums (== i) and cool-down via lower_order_final
        o = min(order, i + 1)
        if lower_order_final:
            o = min(o, steps - i)

        # ---- corrector at step i (uses prev_order, sigma i-1 -> i)
        if i > 0 and (i - 1) not in disable_corrector:
            oc = prev_order
            h = lam[i] - lam[i - 1]
            hh = -h
            rks = []
            for j in range(1, oc):
                rks.append(float((lam[i - 1 - j] - lam[i - 1]) / h))
            rho_d1, rho_last = _unipc_rhos(rks, hh, oc, solver_type, True)
            a_t = 1.0 - sig[i]
            c_x[i] = sig[i] / sig[i - 1]
            c_m0[i] = -a_t * np.expm1(hh)
            b_h = hh if solver_type == "bh1" else np.expm1(hh)
            c_bh[i] = -a_t * b_h
            for j, (rk, rho) in enumerate(zip(rks, rho_d1)):
                c_rho[i, j] = rho
                c_rk[i, j] = rk
            c_rl[i] = rho_last
            use_c[i] = 1.0

        # ---- predictor at step i (sigma i -> i+1)
        h = lam[i + 1] - lam[i]
        hh = -h
        rks = []
        for j in range(1, o):
            rks.append(float((lam[i - j] - lam[i]) / h))
        rho_d1, _ = _unipc_rhos(rks, hh, o, solver_type, False)
        a_t = 1.0 - sig[i + 1]
        p_x[i] = sig[i + 1] / sig[i]
        p_m0[i] = -a_t * np.expm1(hh)
        b_h = hh if solver_type == "bh1" else np.expm1(hh)
        p_bh[i] = -a_t * b_h
        for j, (rk, rho) in enumerate(zip(rks, rho_d1)):
            p_rho[i, j] = rho
            p_rk[i, j] = rk
        prev_order = o

    return SolverPlan(
        kind="unipc", steps=steps, order=order, sigmas=sig,
        timesteps=timesteps, pred_x=p_x, pred_m0=p_m0, pred_bh=p_bh,
        pred_rho=p_rho, pred_rk=p_rk, corr_x=c_x, corr_m0=c_m0, corr_bh=c_bh,
        corr_rho=c_rho, corr_rk=c_rk, corr_rho_last=c_rl,
        use_corrector=use_c)


def plan_dpm(steps: int, shift: float, order: int = 2,
             solver_type: str = "midpoint",
             num_train_timesteps: int = 1000,
             lower_order_final: bool = True,
             sigmas: Optional[np.ndarray] = None) -> SolverPlan:
    """DPM-Solver++ multistep, data prediction (fm_solvers.py:341-520).

    order 1: x_t = (s_t/s_0) x - a_t (e^{-h}-1) m0
    order 2 midpoint: ... - 0.5 a_t (e^{-h}-1) (m0-m1)/r0
    Mapped onto the shared SolverPlan: pred_bh = -a_t (e^{-h}-1)
    (midpoint) with rho = 0.5, rk = r0.
    """
    if sigmas is not None:
        sig = np.concatenate([np.asarray(sigmas, np.float64), [0.0]])
        timesteps = sig[:-1] * num_train_timesteps
        steps = len(sig) - 1
    else:
        timesteps, sig = retrieve_timesteps(steps, shift,
                                            num_train_timesteps)
    lam = _lam(sig)
    K = max(order, 2)

    z = np.zeros(steps)
    p_x, p_m0, p_bh = z.copy(), z.copy(), z.copy()
    p_rho = np.zeros((steps, K - 1))
    p_rk = np.ones((steps, K - 1))

    for i in range(steps):
        o = min(order, i + 1)
        if lower_order_final:
            o = min(o, steps - i)
        h = lam[i + 1] - lam[i]
        a_t = 1.0 - sig[i + 1]
        p_x[i] = sig[i + 1] / sig[i]
        p_m0[i] = -a_t * np.expm1(-h)
        if o >= 2:
            # NOTE sign: the shared step computes pred_bh*rho*(m1 - m0)/rk
            # (UniPC's D1 orientation); DPM's D1 = (m0 - m1)/r0 flips it.
            h_0 = lam[i] - lam[i - 1]
            r0 = h_0 / h
            if solver_type == "midpoint":
                p_bh[i] = a_t * np.expm1(-h)
                p_rho[i, 0] = 0.5
            else:  # heun
                p_bh[i] = -a_t * (np.expm1(-h) / h + 1.0)
                p_rho[i, 0] = 1.0
            p_rk[i, 0] = r0
        # solver_order > 2 is not used by any reference pipeline
        # (text2video.py:204-251 samples with order 2); plan_dpm caps at 2.

    return SolverPlan(
        kind="dpm", steps=steps, order=order, sigmas=sig,
        timesteps=timesteps, pred_x=p_x, pred_m0=p_m0, pred_bh=p_bh,
        pred_rho=p_rho, pred_rk=p_rk, corr_x=z, corr_m0=z, corr_bh=z,
        corr_rho=np.zeros((steps, K - 1)), corr_rk=np.ones((steps, K - 1)),
        corr_rho_last=z, use_corrector=z)


# ---------------------------------------------------------------------------
# device-side stepping


class _PlanSolver:
    """Shared scan-friendly stepping over a SolverPlan."""

    def __init__(self, plan: SolverPlan):
        self.plan = plan
        self._jitted_step = None

    @property
    def jitted_step(self):
        """step() jitted once per solver instance (pair with get_solver
        for cross-call caching)."""
        if self._jitted_step is None:
            self._jitted_step = jax.jit(self.step)
        return self._jitted_step

    @property
    def timesteps(self) -> np.ndarray:
        return self.plan.timesteps

    @property
    def sigmas(self) -> np.ndarray:
        return self.plan.sigmas

    def init_state(self, sample: jnp.ndarray):
        k = max(self.plan.order - 1, 1)
        hist = jnp.zeros((k + 1,) + sample.shape, sample.dtype)
        return {"hist": hist, "last_sample": jnp.zeros_like(sample),
                "step": jnp.asarray(0, jnp.int32)}

    def step(self, state, v: jnp.ndarray, sample: jnp.ndarray,
             step_index) -> Tuple[jnp.ndarray, dict]:
        """One solver step: (velocity at `sample`, state) -> next sample.

        step_index may be a traced int32 (inside lax loops) or a Python
        int; coefficient tables are gathered accordingly.
        """
        p = self.plan
        i = step_index
        f32 = jnp.float32
        sig = jnp.asarray(p.sigmas, f32)
        x = sample.astype(f32)
        v = v.astype(f32)

        x0 = x - sig[i] * v                      # flow conversion (":313")
        hist = state["hist"].astype(f32)
        m0_prev = hist[-1]

        # corrector (UniPC; no-op rows for DPM)
        def gather(tab):
            return jnp.asarray(tab, f32)[i]

        use_c = gather(p.use_corrector)
        d1_sum = jnp.zeros_like(x)
        for j in range(p.pred_rho.shape[1]):
            rho = jnp.asarray(p.corr_rho[:, j], f32)[i]
            rk = jnp.asarray(p.corr_rk[:, j], f32)[i]
            d1_sum = d1_sum + rho * (hist[-2 - j] - m0_prev) / rk
        xc = (gather(p.corr_x) * state["last_sample"].astype(f32)
              + gather(p.corr_m0) * m0_prev
              + gather(p.corr_bh) * (d1_sum
                                     + gather(p.corr_rho_last) * (x0 - m0_prev)))
        x = jnp.where(use_c > 0, xc, x)

        # shift history, append current x0 prediction
        hist = jnp.concatenate([hist[1:], x0[None]], axis=0)

        # predictor
        d1_sum = jnp.zeros_like(x)
        for j in range(p.pred_rho.shape[1]):
            rho = jnp.asarray(p.pred_rho[:, j], f32)[i]
            rk = jnp.asarray(p.pred_rk[:, j], f32)[i]
            d1_sum = d1_sum + rho * (hist[-2 - j] - x0) / rk
        x_next = (gather(p.pred_x) * x + gather(p.pred_m0) * x0
                  + gather(p.pred_bh) * d1_sum)

        new_state = {"hist": hist.astype(sample.dtype),
                     "last_sample": x.astype(sample.dtype),
                     "step": jnp.asarray(i, jnp.int32) + 1}
        return x_next.astype(sample.dtype), new_state

    def sample_loop(self, model_fn: Callable, noise: jnp.ndarray):
        """Full sampling loop as a fori_loop; model_fn(x, t, i) -> velocity."""
        p = self.plan
        ts = jnp.asarray(p.timesteps, jnp.float32)

        def body(i, carry):
            x, state = carry
            v = model_fn(x, ts[i], i)
            x_next, state = self.step(state, v, x, i)
            return (x_next, state)

        x, _ = jax.lax.fori_loop(0, p.steps, body,
                                 (noise, self.init_state(noise)))
        return x


@functools.lru_cache(maxsize=64)
def get_solver(kind: str, steps: int, shift: float,
               num_train_timesteps: int = 1000) -> "_PlanSolver":
    """Cached solver instances so repeated pipeline calls reuse the
    jitted step function (jit caches key on function identity)."""
    if kind not in ("unipc", "dpm++"):
        raise ValueError(
            f"unknown solver {kind!r}; supported: 'unipc', 'dpm++'")
    cls = FlowUniPCSolver if kind == "unipc" else FlowDPMSolver
    return cls(steps=steps, shift=shift,
               num_train_timesteps=num_train_timesteps)


class FlowUniPCSolver(_PlanSolver):
    """Drop-in for FlowUniPCMultistepScheduler (default Wan sampler)."""

    def __init__(self, steps: int, shift: float, order: int = 2,
                 solver_type: str = "bh2", num_train_timesteps: int = 1000,
                 disable_corrector: Tuple[int, ...] = ()):
        super().__init__(plan_unipc(
            steps, shift, order=order, solver_type=solver_type,
            num_train_timesteps=num_train_timesteps,
            disable_corrector=disable_corrector))


class FlowDPMSolver(_PlanSolver):
    """Drop-in for FlowDPMSolverMultistepScheduler (dpm++ path)."""

    def __init__(self, steps: int, shift: float, order: int = 2,
                 solver_type: str = "midpoint",
                 num_train_timesteps: int = 1000,
                 sigmas: Optional[np.ndarray] = None):
        super().__init__(plan_dpm(
            steps, shift, order=order, solver_type=solver_type,
            num_train_timesteps=num_train_timesteps, sigmas=sigmas))
