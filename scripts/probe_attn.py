"""A/B the proj UNet's ds16 attention (B=1, heads=4, T=7125->7168, hd=64):
the Pallas flash kernel measured 5.27 ms/block at 10 TF/s in the round-4
device trace (scripts/probe_r4_proj.py + jax.profiler) = 26.3 ms of the
87.6 ms proj eval. Candidates: flash with tuned BlockSizes, a chunked
einsum scan (online softmax not needed: full K per q-chunk), and the naive
einsum. Chained-call timing, scalar readbacks."""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from functools import partial

B, H, T, D = 1, 4, 7168, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, T, D), np.float32), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, T, D), np.float32), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, T, D), np.float32), jnp.bfloat16)
sm = 1.0 / np.sqrt(D)

def timeit(f, name, n=20):
    y = f(q, k, v); _ = float(jnp.asarray(y, jnp.float32).sum())
    qq = q
    t0 = time.time()
    for i in range(n):
        y = f(qq, k, v)
        qq = q + 1e-6 * jnp.asarray(y, q.dtype)
    _ = float(jnp.asarray(qq, jnp.float32).sum())
    dt = (time.time() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return y

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention)

@jax.jit
def f_flash(q, k, v):
    return flash_attention(q, k, v, causal=False, sm_scale=sm)

ref = timeit(f_flash, "flash default")

for bq, bkm, bk in ((512, 1024, 512), (1024, 1024, 1024),
                    (2048, 2048, 2048), (1024, 3584, 512),
                    (512, 7168, 7168)):
    try:
        bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
        fn = jax.jit(partial(flash_attention, causal=False, sm_scale=sm,
                             block_sizes=bs))
        y = timeit(lambda q, k, v: fn(q, k, v),
                   f"flash bq={bq} bkm={bkm} bk={bk}")
        err = float(jnp.max(jnp.abs(jnp.asarray(y, jnp.float32)
                                    - jnp.asarray(ref, jnp.float32))))
        print(f"   max|d| vs default: {err:.2e}", flush=True)
    except Exception as e:
        print(f"flash bq={bq} bkm={bkm} bk={bk} FAILED: {e}", flush=True)

@jax.jit
def f_naive(q, k, v):
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k,
                      preferred_element_type=jnp.float32) * sm
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", attn, v)

timeit(f_naive, "naive einsum (822MB scores)")

def make_chunked(C):
    @jax.jit
    def f(q, k, v):
        qc = q.reshape(B, H, T // C, C, D)

        def body(_, qb):
            s = jnp.einsum("bhtd,bhsd->bhts", qb, k,
                           preferred_element_type=jnp.float32) * sm
            s = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            return 0, jnp.einsum("bhts,bhsd->bhtd", s, v)
        _, out = jax.lax.scan(body, 0, jnp.moveaxis(qc, 2, 0))
        return jnp.moveaxis(out, 0, 2).reshape(B, H, T, D)
    return f

for C in (512, 1024, 2048):
    y = timeit(make_chunked(C), f"chunked einsum C={C}")
    err = float(jnp.max(jnp.abs(jnp.asarray(y, jnp.float32)
                                - jnp.asarray(ref, jnp.float32))))
    print(f"   max|d| vs flash: {err:.2e}", flush=True)
