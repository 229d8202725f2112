"""Direct A/B parity against the reference implementation, imported live.

The strongest parity evidence available without the reference's pretrained
weights: `/root/reference/Model/model.py` is imported as a CPU-torch oracle
(numba/torchvision stubbed — the numba CUDA kernel runs as a plain Python
loop under the stub, full coverage) and run side-by-side with our JAX
implementation on identical inputs:

  * schedule tables (cosine/linear, float64 algebra, model.py:315-421);
  * every closed-form q/p method (model.py:438-502);
  * the FULL guided_reverse_process loop (model.py:518-642) with the noise
    draws forced to zero on both sides — constant-λ, static-schedule
    adaptive-λ-map (the flagship ART test_prog configuration), and the
    fully-adaptive proj path including the noise-strength classing;
  * the sparse DDIM path (model.py:655-759).

Any algebra/ordering/clamp drift in our sampler vs the reference breaks
these tests with a numeric diff, not a judgement call.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "Model", "model.py")),
    reason="reference tree not present")


def _install_stubs():
    """Stub numba (CUDA kernels run as serial Python loops) and torchvision
    (imported by the reference Dataset module, unused in these tests)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        class _Dispatcher:
            def __init__(self, fn):
                self.fn = fn

            def __getitem__(self, cfg):      # kernel[(blocks, threads)](...)
                return self.fn

            def __call__(self, *a, **k):
                return self.fn(*a, **k)

        def _jit(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return _Dispatcher(a[0])
            return lambda fn: _Dispatcher(fn)

        cuda = types.ModuleType("numba.cuda")
        cuda.jit = _jit
        # serial full-coverage grid: one thread iterating every index
        cuda.grid = lambda n: (0,) * n
        cuda.gridsize = lambda n: (1,) * n
        numba.cuda = cuda
        numba.jit = _jit
        numba.njit = _jit
        numba.prange = range
        sys.modules["numba"] = numba
        sys.modules["numba.cuda"] = cuda
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.ToTensor = object
        tr.Compose = object
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import Model.model as ref_model
    return ref_model


@pytest.fixture(scope="module")
def torch():
    import torch
    return torch


def _toy_x(shape, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random(shape).astype(np.float32) * scale)


def _toy_model_pair(torch):
    """The same deterministic ε-model in torch (NCHW) and JAX (NHWC):
    eps = 0.1*x + sin(arange(W)) broadcast along the detector axis."""
    import jax.numpy as jnp

    class TorchToy(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x, t):
            w = torch.sin(torch.arange(x.shape[-1], dtype=torch.float32))
            return 0.1 * x + w

    def jax_toy(x, t):
        w = jnp.sin(jnp.arange(x.shape[2], dtype=jnp.float32))
        return 0.1 * x + w[None, None, :, None]

    return TorchToy(), jax_toy


def _to_ref(x_np):       # [B,H,W] -> NCHW torch
    import torch
    return torch.from_numpy(x_np[:, None, :, :].copy())


def _to_jax(x_np):       # [B,H,W] -> NHWC jnp
    import jax.numpy as jnp
    return jnp.asarray(x_np[..., None])


def _from_ref(x_t):
    return np.asarray(x_t.detach().cpu().numpy())[:, 0]


def _from_jax(x_j):
    return np.asarray(x_j)[..., 0]


# ---------------------------------------------------------------------------
# tables + closed-form methods
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("schedule,power", [("cosine", 1), ("cosine", 2),
                                            ("linear", 1), ("linear", 2)])
def test_tables_match_reference(ref, schedule, power):
    from ipdm_tpu.diffusion.diffusion import make_tables
    T = 60
    rgd = ref.GaussianDiffusion(timesteps=T, beta_schedule=schedule,
                                schedule_power=power)
    ours = make_tables(T, schedule, power)
    for name in ("betas", "alphas", "alphas_cumprod", "alphas_cumprod_prev",
                 "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                 "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2"):
        want = np.asarray(getattr(rgd, name).numpy(), np.float64)
        got = np.asarray(getattr(ours, name), np.float64)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7,
                                   err_msg=f"{schedule}^{power}.{name}")


def test_step_algebra_matches_reference(ref, torch):
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    import jax.numpy as jnp
    T = 50
    rgd = ref.GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    gd = GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    x0 = _toy_x((2, 8, 8))
    noise = _toy_x((2, 8, 8), seed=1) - 0.5
    t_np = np.array([3, 41])
    rt = torch.from_numpy(t_np)
    jt = jnp.asarray(t_np, jnp.int32)

    got = _from_jax(gd.q_sample(_to_jax(x0), jt, _to_jax(noise)))
    want = _from_ref(rgd.q_sample(_to_ref(x0), rt, _to_ref(noise)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    xt = want
    got = _from_jax(gd.q_sample_inverse(_to_jax(xt), _to_jax(x0), jt))
    want2 = _from_ref(rgd.q_sample_inverse(_to_ref(xt), _to_ref(x0), rt))
    np.testing.assert_allclose(got, want2, rtol=1e-5, atol=1e-6)

    got = _from_jax(gd.predict_start_from_noise(_to_jax(xt), jt,
                                                _to_jax(noise)))
    want3 = _from_ref(rgd.predict_start_from_noise(_to_ref(xt), rt,
                                                   _to_ref(noise)))
    np.testing.assert_allclose(got, want3, rtol=1e-5, atol=1e-6)

    gm, gv, gl = gd.q_posterior_mean_variance(_to_jax(x0), _to_jax(xt), jt)
    wm, wv, wl = rgd.q_posterior_mean_variance(_to_ref(x0), _to_ref(xt), rt)
    np.testing.assert_allclose(_from_jax(gm), _from_ref(wm), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv).ravel(),
                               np.asarray(wv).ravel(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gl).ravel(),
                               np.asarray(wl).ravel(), rtol=1e-6)


def test_p_mean_variance_condition_matches_reference(ref, torch):
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    import jax.numpy as jnp
    T = 50
    rgd = ref.GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    gd = GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    tmodel, jmodel = _toy_model_pair(torch)
    x0 = _toy_x((1, 8, 8))
    xt = _toy_x((1, 8, 8), seed=2) - 0.2
    for clip in (False, True):
        for lam in (0.0, 0.45, 1.0):
            t_np = np.array([7])
            with torch.no_grad():
                wm, _, wl = rgd.p_mean_variance_condition(
                    tmodel, _to_ref(xt), _to_ref(x0),
                    torch.from_numpy(t_np), lam, clip_denoised=clip)
            gm, _, gl = gd.p_mean_variance_condition(
                jmodel, _to_jax(xt), _to_jax(x0),
                jnp.asarray(t_np, jnp.int32), lam, clip_denoised=clip)
            np.testing.assert_allclose(_from_jax(gm), _from_ref(wm),
                                       rtol=5e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(gl).ravel(),
                                       np.asarray(wl).ravel(), rtol=1e-6)


# ---------------------------------------------------------------------------
# full guided loops, zero-noise on both sides
# ---------------------------------------------------------------------------


@pytest.fixture
def zero_noise(monkeypatch, torch):
    import jax
    import jax.numpy as jnp
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    yield


def _run_both(ref, torch, mode, t_start, constant_guidance, adaptive=False,
              scale=1.0, amplitude=5.0, eta=0.5, seed=3):
    """Run reference + ours on identical inputs; return (ref_outs, our_outs,
    ref_ns, our_ns)."""
    import jax
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import guided_reverse_process
    from ipdm_tpu.ops.lambda_curve import curve_init, proj_curve_init

    T = 50
    rgd = ref.GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    gd = GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    tmodel, jmodel = _toy_model_pair(torch)
    x0 = _toy_x((1, 16, 16), scale=scale, seed=seed)

    jcurve = curve_init() if mode == "img" else proj_curve_init()

    def np_curve(a):           # the reference consumes a numpy-level curve
        return np.asarray(jax.device_get(jcurve(np.asarray(a, np.float32))))

    kwargs = dict(only_convertor=False, normal=False,
                  kernel_size_img=4, kernel_size_proj=4,
                  amplitude_img=amplitude, amplitude_proj=amplitude,
                  lambda_curve=np_curve, noise_strength=None,
                  ldct=_to_ref(x0))
    with torch.no_grad():
        r_out, _, r_ns = rgd.guided_reverse_process(
            tmodel, _to_ref(x0), t_start=list(t_start) if t_start else None,
            clip=True, eta=eta, mode=mode,
            constant_guidance=constant_guidance, **kwargs)

    # fresh jmodel identity per call -> fresh jit trace under the zero-noise
    # patch (the fused samplers key their cache on the model_fn object)
    jmodel2 = lambda x, t: jmodel(x, t)
    o_out, _, o_ns = guided_reverse_process(
        jmodel2, gd, _to_jax(x0), jax.random.PRNGKey(0),
        t_start=list(t_start) if t_start else None, clip=True, eta=eta,
        mode=mode, constant_guidance=constant_guidance,
        lambda_curve=jcurve, kernel_size=4, amplitude=amplitude,
        ldct=_to_jax(x0))
    return ([_from_ref(r) for r in r_out], [_from_jax(o) for o in o_out],
            r_ns, o_ns)


@pytest.mark.parametrize("mode,cg,eta", [("img", 0.45, 0.7),
                                         ("proj", 0.5, 0.4)])
def test_guided_constant_full_loop_matches_reference(ref, torch, zero_noise,
                                                     mode, cg, eta):
    """Constant-λ multi-iteration loop + ensemble, both domains."""
    r_out, o_out, _, _ = _run_both(ref, torch, mode, [4, 3, 3], cg, eta=eta)
    assert len(r_out) == len(o_out) == 4
    for i, (r, o) in enumerate(zip(r_out, o_out)):
        np.testing.assert_allclose(o, r, rtol=2e-3, atol=5e-5,
                                   err_msg=f"{mode} iter {i}")


def test_guided_static_adaptive_map_matches_reference(ref, torch, zero_noise):
    """The flagship ART test_prog proj configuration: static t_start with
    constant_guidance=None → cosine-λ probe, per-pixel λ map afterwards
    (the numba kernel runs serially under the stub)."""
    r_out, o_out, _, _ = _run_both(ref, torch, "proj", [5, 4], None,
                                   scale=2.0, amplitude=3.0)
    assert len(r_out) == len(o_out) == 3   # probe + 1 rest + ensemble
    for i, (r, o) in enumerate(zip(r_out, o_out)):
        np.testing.assert_allclose(o, r, rtol=5e-3, atol=1e-4,
                                   err_msg=f"iter {i}")


def test_guided_fully_adaptive_proj_matches_reference(ref, torch, zero_noise):
    """t_start=None: 20-step probe, noise-strength classing from delt.max(),
    probe dropped from the returned iterations."""
    r_out, o_out, r_ns, o_ns = _run_both(ref, torch, "proj", None, None,
                                         scale=2.0, amplitude=3.0)
    assert r_ns == o_ns
    assert len(r_out) == len(o_out)
    for i, (r, o) in enumerate(zip(r_out, o_out)):
        np.testing.assert_allclose(o, r, rtol=5e-3, atol=1e-4,
                                   err_msg=f"iter {i} (class {r_ns})")


def test_sparse_ddim_matches_reference(ref, torch, zero_noise):
    import jax
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import sparse_guided_reverse_process
    T = 50
    rgd = ref.GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    gd = GaussianDiffusion(timesteps=T, beta_schedule="cosine")
    tmodel, jmodel = _toy_model_pair(torch)
    x0 = _toy_x((1, 16, 16), seed=4)
    with torch.no_grad():
        r_out = rgd.sparse_guided_reverse_process(
            tmodel, _to_ref(x0), [4, 3, 3], condition_lambda_max=0.5,
            condition_lambda_min=0.25, ddim_timesteps=[2, 2, 3],
            ddim_eta=0.0, eta=0.5, clip_denoised=True)
    o_out = sparse_guided_reverse_process(
        (lambda x, t: jmodel(x, t)), gd, _to_jax(x0), jax.random.PRNGKey(0),
        t_start=[4, 3, 3], condition_lambda_max=0.5,
        condition_lambda_min=0.25, ddim_timesteps=[2, 2, 3], ddim_eta=0.0,
        eta=0.5, clip_denoised=True)
    assert len(r_out) == len(o_out) == 3
    for i, (r, o) in enumerate(zip(r_out, o_out)):
        np.testing.assert_allclose(_from_jax(o), _from_ref(r), rtol=2e-3,
                                   atol=5e-5, err_msg=f"ddim iter {i}")
