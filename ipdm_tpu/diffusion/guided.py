"""Guided partial-diffusion samplers — the algorithmic core of IPDM.

TPU redesign of the reference's guided_reverse_process
(Model/model.py:518-642), ddim_sample (:655-724) and
sparse_guided_reverse_process (:727-759):

  * the inner reverse loop (one UNet eval per timestep) is a single jitted
    `lax.scan` carrying (x_t, rng) — no per-step host sync;
  * the per-pixel guidance map λ(i) that the reference computes by shipping
    host numpy arrays into a numba CUDA kernel every step (model.py:554-560)
    is two fused elementwise ops on device (ipdm_tpu.ops.lambda_map);
  * the outer iteration loop stays in Python (3-4 trips, each dispatching one
    scan); the data-dependent adaptive schedule selection (model.py:584-613)
    reads back exactly one scalar per probe iteration.

Faithfulness notes (kept bit-compatible in structure, stochastic draws via
jax.random instead of torch RNG):
  * λ sources per step: constant | cosine table (probe iter) | per-pixel map;
  * guidance ε-blend: std((1−λ)·std(ε̂) + λ·std(ε_cond));
  * post-iteration clamps, guidance updates imgs = η·x̂ + (1−η)·x₀ (proj) /
    η·x̂ + (0.95−η)·x₀ + 0.05·ldct (img), probe-iteration restart, and the
    final 2-tap ensemble (x̂_last + x̂_prev)/2.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.data.units import miu2pixel
from ipdm_tpu.diffusion.diffusion import GaussianDiffusion, extract, \
    std_normalize
from ipdm_tpu.diffusion.schedules import cosine_beta_schedule
from ipdm_tpu.ops.lambda_map import avg_pool, condition_lambda_map, \
    nearest_upsample


def _torch_median(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics: the (n-1)//2-th order statistic (lower median
    for even n), unlike jnp.median which averages the middle pair."""
    flat = x.reshape(-1)
    return jnp.sort(flat)[(flat.size - 1) // 2]


def _compute_delt(x_denoised, x_input, mode: str, kernel_size: int,
                  amplitude: float, lambda_curve) -> jnp.ndarray:
    """Residual-driven per-pixel λ exponent map after the probe iteration
    (reference model.py:574-614). Returns the pooled map [B,h,w,C], plus its
    max (for proj noise classing)."""
    if mode == "img":
        delt = jnp.abs(miu2pixel(x_denoised) - miu2pixel(x_input))
        delt = avg_pool(delt, kernel_size)
        delt = delt - _torch_median(delt)
        delt = jnp.maximum(delt, 0.0)
        delt = lambda_curve(jnp.exp(amplitude * delt))
        return delt, None
    else:
        delt = jnp.abs(x_denoised - x_input)
        delt = delt - _torch_median(delt)
        delt = avg_pool(delt, kernel_size)
        delt = jnp.maximum(delt, 0.0)
        delt = jnp.exp(amplitude * delt)
        dmax = jnp.max(delt)
        delt = lambda_curve(delt)
        return delt, dmax


# adaptive schedules (reference model.py:584-613)
_IMG_ADAPTIVE = {"high": ([15, 15, 15], 0.6, 0.4),
                 "mid": ([15, 12, 10], 0.55, 0.45),
                 "low": ([10, 10, 10], 0.5, 0.5),
                 None: ([10, 10, 10], 0.5, 0.5)}
_PROJ_ADAPTIVE = {"high": ([30, 25, 20], 0.6),
                  "mid": ([20, 18, 15], 0.5),
                  "low": ([15, 15, 15], 0.5)}


class ProbeSpec(NamedTuple):
    """Static config of the fused probe iteration (iter 0, cosine lambda)."""
    ts: int
    mode: str
    clip: bool
    lambda_ratio: float
    kernel_size: int
    amplitude: float
    curve: object          # LambdaCurve (static by identity)


class RestSpec(NamedTuple):
    """Static config of the fused multi-iteration pass."""
    ts_list: Tuple[int, ...]
    mode: str
    clip: bool
    eta: float
    lambda_kind: str       # 'constant' | 'map'
    constant_guidance: float = 0.0
    has_ldct: bool = False
    save_states: bool = False


# --- params threading -------------------------------------------------------
# model_fn may be (a) a plain callable (x, t) -> eps closing over its params,
# or (b) a PAIR (apply_fn, params) with apply_fn(params, x, t) -> eps. Form
# (b) threads the params through the jitted entry points as TRACED arguments;
# form (a) bakes whatever the closure holds into the program as constants —
# measured +~300 MB on the serialized flagship executables (params embedded
# in the binary), which the relay's executable fetch turns into warmup time
# (docs/PERF.md). The engine and bench use form (b); plain callables keep
# working for tests/experiments.

import weakref

_NOPARAM_CACHE = weakref.WeakValueDictionary()


class ModelApply:
    """Hashable apply_fn for form (b): equal for equal model definitions.

    flax Modules compare/hash structurally, so two engine (or test)
    instances built around identical architectures produce EQUAL ModelApply
    objects — the guided samplers' jit caches then share one trace instead
    of recompiling per instance. Use as
    ``guided_reverse_process((ModelApply(model), params), ...)``."""

    def __init__(self, model):
        self.model = model

    def __call__(self, params, x, t):
        return self.model.apply(params, x, t)

    def __eq__(self, other):
        return isinstance(other, ModelApply) and self.model == other.model

    def __hash__(self):
        return hash((type(self), self.model))


class _NoParamApply:
    """Stable (apply_fn, ()) wrapper for closed-over model_fns: identity is
    cached per model_fn so jit's static-argument cache keys stay stable."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, params, x, t):
        return self.fn(x, t)


def _split_model_fn(model_fn):
    """Normalize to (apply_fn(params, x, t) static, params pytree traced)."""
    if isinstance(model_fn, tuple):
        apply_fn, params = model_fn
        return apply_fn, params
    wrapped = _NOPARAM_CACHE.get(id(model_fn))
    if wrapped is None or wrapped.fn is not model_fn:
        wrapped = _NoParamApply(model_fn)
        _NOPARAM_CACHE[id(model_fn)] = wrapped
    return wrapped, ()


def _one_iteration(model_fn, gd, ts: int, mode: str, clip: bool,
                   lam_fn, x, guidance, rng, save_states: bool = False):
    """q_sample to ts, reverse-scan to 0, post-clamp - one outer iteration,
    fully traced (no host dispatch boundaries). save_states additionally
    returns the per-step reverse trajectory [ts, B, H, W, C] (the reference
    img_reverse list, model.py:568)."""
    B = x.shape[0]
    rng, k_noise, k_scan = jax.random.split(rng, 3)
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    t_vec = jnp.full((B,), ts, dtype=jnp.int32)
    x = gd.q_sample(x, t_vec, noise)

    def step(carry, i):
        xc, r = carry
        r, sub = jax.random.split(r)
        lam = lam_fn(i)
        t = jnp.full((B,), i, dtype=jnp.int32)
        xc = gd.p_sample_condition(model_fn, xc, guidance, t, sub,
                                   clip_denoised=clip, lambda_=lam)
        return (xc, r), (xc if save_states else None)

    (x, _), states = jax.lax.scan(step, (x, k_scan),
                                  jnp.arange(ts - 1, -1, -1))
    if clip:
        x = jnp.clip(x, 0.0, 1.0) if mode == "img" else jnp.maximum(x, 0.0)
    return (x, states) if save_states else x


@partial(jax.jit, static_argnames=("model_fn", "gd", "spec"))
def fused_probe(model_fn: Callable, gd: GaussianDiffusion, spec: ProbeSpec,
                params, x0: jnp.ndarray, rng) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray,
                                                       jnp.ndarray]:
    """Iter-0 probe: cosine-lambda guided pass + residual lambda-map, one
    dispatch. Returns (probe_result, delt_map, delt_max). model_fn is the
    params-explicit apply (see _split_model_fn); params are traced."""
    fn = lambda x, t: model_fn(params, x, t)
    cos_table = jnp.asarray(
        cosine_beta_schedule(spec.ts, schedule_power=spec.lambda_ratio),
        dtype=jnp.float32)
    x = _one_iteration(fn, gd, spec.ts, spec.mode, spec.clip,
                       lambda i: cos_table[i], x0, x0, rng)
    delt, dmax = _compute_delt(x, x0, spec.mode, spec.kernel_size,
                               spec.amplitude, spec.curve)
    if dmax is None:
        dmax = jnp.zeros(())
    return x, delt, dmax


# Scan the outer iterations instead of unrolling when every ts is equal:
# same math and rng split order (outputs agree to f32 fusion-reordering
# noise, ~1e-6), but the compiled program contains ONE iteration body
# instead of len(ts_list) —
# the flagship preset's t_start=[15,15,15] stages shrink ~3x in HLO, which
# cuts both XLA compile time and the executable fetch through the relay
# (docs/PERF.md round-2 host: 348 s warmup even on a comp-cache HIT).
# The scan lowering is unconditional for eligible specs: the round-4 host
# A/B measured a runtime tie with the unrolled form (786 vs 790 ms for the
# 45-eval img stage) with 2x faster compile and ~3x smaller HLO, so the
# IPDM_ITER_SCAN env gate was removed (git history at the round-4
# commits). The module flag remains ONLY so the parity tests can force
# the unrolled form on uniform ts_lists (the unrolled path still serves
# non-uniform ts_list / save_states specs).
_ITER_SCAN = True


def _guidance_update(spec: RestSpec, x, x0, ldct):
    """imgs update between iterations (reference model.py:622-635)."""
    if spec.mode == "proj":
        return spec.eta * x + (1 - spec.eta) * x0
    base = ldct if spec.has_ldct else x0
    return spec.eta * x + (0.95 - spec.eta) * x0 + 0.05 * base


@partial(jax.jit, static_argnames=("model_fn", "gd", "spec"))
def fused_iters(model_fn: Callable, gd: GaussianDiffusion, spec: RestSpec,
                params, x_init: jnp.ndarray, x0: jnp.ndarray,
                guidance: jnp.ndarray,
                delt_map: jnp.ndarray, ldct: jnp.ndarray, rng
                ) -> List[jnp.ndarray]:
    """All remaining outer iterations in ONE dispatch (a lax.scan over the
    iterations when ts_list is uniform, else unrolled; each iteration is
    itself a lax.scan over timesteps). Mirrors the reference
    guidance-update schedule (model.py:622-635). model_fn is the
    params-explicit apply; params are traced."""
    model_fn = (lambda mf: lambda x, t: mf(params, x, t))(model_fn)
    n_it = len(spec.ts_list)
    if (_ITER_SCAN and n_it > 1 and len(set(spec.ts_list)) == 1
            and not spec.save_states):
        ts = int(spec.ts_list[0])
        if spec.lambda_kind == "constant":
            lam_fn = lambda i: jnp.float32(spec.constant_guidance)
        else:
            lam_fn = lambda i: nearest_upsample(
                condition_lambda_map(delt_map, i, ts),
                (x0.shape[1], x0.shape[2]))

        def body(carry, _):
            x, g, r = carry
            r, k = jax.random.split(r)
            x = _one_iteration(model_fn, gd, ts, spec.mode, spec.clip,
                               lam_fn, x, g, k)
            return (x, _guidance_update(spec, x, x0, ldct), r), x

        _, ys = jax.lax.scan(body, (x_init, guidance, rng), None,
                             length=n_it)
        return [ys[i] for i in range(n_it)]

    results = []
    states = []
    x = x_init
    for it, ts in enumerate(spec.ts_list):
        if spec.lambda_kind == "constant":
            lam_fn = lambda i: jnp.float32(spec.constant_guidance)
        else:
            lam_fn = (lambda ts_: lambda i: nearest_upsample(
                condition_lambda_map(delt_map, i, ts_),
                (x0.shape[1], x0.shape[2])))(int(ts))
        rng, k = jax.random.split(rng)
        if spec.save_states:
            x, st = _one_iteration(model_fn, gd, int(ts), spec.mode,
                                   spec.clip, lam_fn, x, guidance, k,
                                   save_states=True)
            states.append(st)
        else:
            x = _one_iteration(model_fn, gd, int(ts), spec.mode, spec.clip,
                               lam_fn, x, guidance, k)
        results.append(x)
        # guidance update for the next iteration
        if spec.mode == "proj":
            guidance = spec.eta * x + (1 - spec.eta) * x0
        else:
            base = ldct if spec.has_ldct else x0
            guidance = (spec.eta * x + (0.95 - spec.eta) * x0 + 0.05 * base)
    if spec.save_states:
        return results, states
    return results


@partial(jax.jit, static_argnames=("model_fn", "gd", "pspec", "rspec"))
def fused_probe_and_iters(model_fn: Callable, gd: GaussianDiffusion,
                          pspec: ProbeSpec, rspec: RestSpec, params,
                          x0: jnp.ndarray, ldct: jnp.ndarray, rng):
    """Probe + λ-map + all remaining iterations in ONE device program.

    Used when the outer schedule is static (t_start given → no adaptive
    noise-strength readback between probe and rest): dispatching the probe
    and the rest separately costs a full param-tree marshal per program
    through the device transport. Bit-identical to the split path — the
    rng splits mirror guided_reverse_process's order exactly.

    When every iteration (probe included) has the same ts and states are
    not kept, the whole process lowers to ONE lax.scan whose body holds a
    single UNet instance: iteration 0 selects the cosine-λ source, computes
    the residual λ-map (lax.cond), and restarts the carry from the clean
    condition — the traced program shrinks ~2× (one iteration body instead
    of probe + rest), which cuts XLA compile time and the executable fetch
    through the relay (docs/PERF.md). Same math, same rng split order: the
    scan consumes one split per iteration exactly like fused_iters, and
    iteration 0 substitutes the pre-split probe key."""
    rng, k_probe = jax.random.split(rng)
    fn = (lambda mf: lambda x, t: mf(params, x, t))(model_fn)
    if (_ITER_SCAN and not rspec.save_states
            and rspec.lambda_kind == "map" and len(rspec.ts_list) >= 1
            and set(rspec.ts_list) == {pspec.ts}):
        rng, k_rest = jax.random.split(rng)
        ts = int(pspec.ts)
        n_total = 1 + len(rspec.ts_list)
        H, W = x0.shape[1], x0.shape[2]
        cos_table = jnp.asarray(
            cosine_beta_schedule(ts, schedule_power=pspec.lambda_ratio),
            dtype=jnp.float32)
        zero_delt = jnp.zeros_like(avg_pool(x0, pspec.kernel_size))

        def body(carry, idx):
            x_in, g, delt, r = carry
            is_probe = idx == 0
            r2, k = jax.random.split(r)
            k_use = jnp.where(is_probe, k_probe, k)

            def lam_fn(i):
                lam_map = nearest_upsample(
                    condition_lambda_map(delt, i, ts), (H, W))
                return jnp.where(is_probe, cos_table[i], lam_map)

            x = _one_iteration(fn, gd, ts, rspec.mode, rspec.clip,
                               lam_fn, x_in, g, k_use)
            delt2 = jax.lax.cond(
                is_probe,
                lambda: _compute_delt(x, x0, pspec.mode, pspec.kernel_size,
                                      pspec.amplitude, pspec.curve)[0],
                lambda: delt)
            # probe restart (model.py:629-630): iteration 1 starts from the
            # clean condition with guidance = clean condition
            x_carry = jnp.where(is_probe, x0, x)
            g_next = jnp.where(is_probe, x0,
                               _guidance_update(rspec, x, x0, ldct))
            r_out = jnp.where(is_probe, r, r2)
            return (x_carry, g_next, delt2, r_out), x

        _, ys = jax.lax.scan(body, (x0, x0, zero_delt, k_rest),
                             jnp.arange(n_total))
        return ys[0], [ys[i] for i in range(1, n_total)]
    probe_x, delt_map, _ = fused_probe(model_fn, gd, pspec, params, x0,
                                       k_probe)
    rng, k_rest = jax.random.split(rng)
    out = fused_iters(model_fn, gd, rspec, params, x0, x0, x0, delt_map,
                      ldct, k_rest)
    return probe_x, out


def guided_reverse_process(model_fn: Callable, gd: GaussianDiffusion,
                           img: jnp.ndarray, rng, t_start=None,
                           clip: bool = True, lambda_ratio: float = 1,
                           eta: float = 0.5, mode: str = "img",
                           constant_guidance: Optional[float] = None,
                           lambda_curve=None, kernel_size: int = 4,
                           amplitude: float = 20.0,
                           noise_strength: Optional[str] = None,
                           ldct: Optional[jnp.ndarray] = None,
                           only_convertor: bool = False,
                           save_states: bool = False
                           ) -> Tuple[List[jnp.ndarray], Optional[list], Optional[str]]:
    """Iterative guided reverse process (reference model.py:518-642).

    img: condition input [B,H,W,C] (NHWC). Returns (img_iters, reverse_states,
    noise_strength) like the reference.

    Dispatch budget (the TPU-native redesign): the whole multi-iteration
    process is at most TWO device programs - a fused probe (iter 0 +
    lambda-map) and a fused pass over all remaining iterations - instead of
    the reference's per-step kernel launches + host numpy round-trips. Only
    the adaptive *proj* mode reads one scalar (delt max) back between the
    two dispatches.
    """
    if only_convertor:
        return [img], None, None
    model_fn, params = _split_model_fn(model_fn)
    adaptive = t_start is None
    out_noise_strength = None
    zero_delt = jnp.zeros_like(avg_pool(img, kernel_size))
    ldct_arr = ldct if ldct is not None else img

    if constant_guidance is not None:
        # all iterations constant-lambda: no probe, x carries across iters
        rng, k = jax.random.split(rng)
        spec = RestSpec(ts_list=tuple(int(t) for t in (t_start or [20])),
                        mode=mode, clip=clip, eta=float(eta),
                        lambda_kind="constant",
                        constant_guidance=float(constant_guidance),
                        has_ldct=ldct is not None,
                        save_states=bool(save_states))
        out = fused_iters(model_fn, gd, spec, params, img, img, img,
                          zero_delt, ldct_arr, k)
        img_iters, img_reverse = out if save_states else (out, None)
    else:
        # probe iteration (cosine lambda) + schedule choice + map-lambda rest
        probe_ts = 20 if adaptive else int(t_start[0])
        pspec = ProbeSpec(ts=probe_ts, mode=mode, clip=clip,
                          lambda_ratio=float(lambda_ratio),
                          kernel_size=int(kernel_size),
                          amplitude=float(amplitude), curve=lambda_curve)
        if not adaptive:
            # static schedule → no readback between probe and rest: run
            # the whole multi-iteration process as ONE device program
            sched = [int(t) for t in t_start[1:]]
            spec = RestSpec(ts_list=tuple(sched), mode=mode, clip=clip,
                            eta=float(eta), lambda_kind="map",
                            has_ldct=ldct is not None,
                            save_states=bool(save_states))
            probe_x, out = fused_probe_and_iters(model_fn, gd, pspec, spec,
                                                 params, img, ldct_arr, rng)
            rest, img_reverse = out if save_states else (out, None)
            img_iters = [probe_x] + rest
            if len(img_iters) > 1:
                img_iters.append((img_iters[-1] + img_iters[-2]) / 2)
            return img_iters, img_reverse, out_noise_strength
        rng, k_probe = jax.random.split(rng)
        probe_x, delt_map, dmax = fused_probe(model_fn, gd, pspec, params,
                                              img, k_probe)
        if mode == "img":
            sched, eta, _ls = _IMG_ADAPTIVE[noise_strength]
        else:
            dmax_f = float(dmax)  # the one host sync per slice
            if dmax_f >= 30:
                out_noise_strength = "high"
            elif dmax_f >= 4.5:
                out_noise_strength = "mid"
            else:
                out_noise_strength = "low"
            sched, eta = _PROJ_ADAPTIVE[out_noise_strength]
        rng, k_rest = jax.random.split(rng)
        spec = RestSpec(ts_list=tuple(sched), mode=mode, clip=clip,
                        eta=float(eta), lambda_kind="map",
                        has_ldct=ldct is not None,
                        save_states=bool(save_states))
        # probe restart (model.py:629-630): the rest starts from the clean
        # condition with guidance = clean condition (imgs only updates from
        # iteration 1 onward)
        img_reverse = None
        if sched:
            out = fused_iters(model_fn, gd, spec, params, img, img, img,
                              delt_map, ldct_arr, k_rest)
            rest, img_reverse = out if save_states else (out, None)
        else:
            rest = []
        img_iters = [probe_x] + rest

    if len(img_iters) > 1:
        img_iters.append((img_iters[-1] + img_iters[-2]) / 2)
    if adaptive:
        img_iters = img_iters[1:]  # drop the probe iteration
    return img_iters, img_reverse, out_noise_strength



# ---------------------------------------------------------------------------
# Sparse (DDIM) sampling path (reference model.py:655-759)
# ---------------------------------------------------------------------------


@partial(jax.jit,
         static_argnames=("model_fn", "gd", "t_start", "ddim_timesteps",
                          "clip_denoised"))
def ddim_sample(model_fn: Callable, gd: GaussianDiffusion,
                params, sample_img: jnp.ndarray, condition: jnp.ndarray,
                t_start: int, condition_lambda, rng,
                ddim_timesteps: int = 2, ddim_eta: float = 0.0,
                clip_denoised: bool = True) -> jnp.ndarray:
    """Conditioned DDIM over a uniform sub-sequence of t_start steps
    (reference model.py:655-724, 'uniform' discretisation). model_fn is
    the params-explicit apply (see _split_model_fn); params are traced."""
    model_fn = (lambda mf: lambda x, t: mf(params, x, t))(model_fn)
    seq = np.linspace(t_start - 1, 0, ddim_timesteps + 1).astype(int)[:-1]
    prev_seq = np.append(seq[1:], 0)
    B = sample_img.shape[0]
    tb = gd.tables

    x = sample_img
    for i in range(ddim_timesteps):
        t = jnp.full((B,), int(seq[i]), dtype=jnp.int32)
        pt = jnp.full((B,), int(prev_seq[i]), dtype=jnp.int32)
        nd = x.ndim
        ac_t = extract(tb.alphas_cumprod, t, nd)
        ac_prev = extract(tb.alphas_cumprod, pt, nd)
        pred_noise = model_fn(x, t)
        cond_noise = gd.q_sample_inverse(x, condition, t).astype(
            pred_noise.dtype)
        pred_noise = std_normalize(
            (1 - condition_lambda) * std_normalize(pred_noise)
            + condition_lambda * std_normalize(cond_noise))
        pred_x0 = (x - jnp.sqrt(1.0 - ac_t) * pred_noise) / jnp.sqrt(ac_t)
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        sigmas_t = ddim_eta * jnp.sqrt(
            (1 - ac_prev) / (1 - ac_t) * (1 - ac_t / ac_prev))
        pred_dir = jnp.sqrt(1 - ac_prev - sigmas_t ** 2) * pred_noise
        # the reference then overrides σ with η·posterior_variance (:713)
        sigmas_t = ddim_eta * extract(tb.posterior_variance, t, nd)
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.sqrt(ac_prev) * pred_x0 + pred_dir + sigmas_t * z
    return x


def sparse_guided_reverse_process(model_fn: Callable, gd: GaussianDiffusion,
                                  condition: jnp.ndarray, rng,
                                  t_start: Sequence[int],
                                  condition_lambda_max: float = 0.5,
                                  condition_lambda_min: float = 0.25,
                                  ddim_timesteps: Sequence[int] = (2,),
                                  ddim_eta: float = 0.0, eta: float = 0.5,
                                  clip_denoised: bool = True
                                  ) -> List[jnp.ndarray]:
    """Iterated DDIM with a linear λ ramp (reference model.py:727-759)."""
    model_fn, params = _split_model_fn(model_fn)
    B = condition.shape[0]
    rng, k = jax.random.split(rng)
    noise = jax.random.normal(k, condition.shape, condition.dtype)
    sample_img = gd.q_sample(condition,
                             jnp.full((B,), int(t_start[0]), jnp.int32),
                             noise)
    condition_0 = condition
    n = len(t_start)
    step = (condition_lambda_max - condition_lambda_min) / n
    lambdas = np.arange(condition_lambda_max,
                        condition_lambda_min - step, -step)
    result = []
    for i, t in enumerate(t_start):
        rng, k = jax.random.split(rng)
        sample_img = ddim_sample(model_fn, gd, params, sample_img, condition,
                                 int(t), float(lambdas[i]), k,
                                 ddim_timesteps=int(ddim_timesteps[i]),
                                 ddim_eta=float(ddim_eta),
                                 clip_denoised=clip_denoised)
        condition = eta * sample_img + (1 - eta) * condition_0
        result.append(sample_img)
    return result
