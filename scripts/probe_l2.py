"""TPU probe #11: localize the ~35 ms dark matter around the L2 level.

L1-3 (91.1) - L1-only (31.7) - (L3+middle ~4) leaves ~55 ms for the L2
region; accounted ops (conv 144->16 x3 ~10 ms, boundaries ~8) leave ~35 ms
unexplained. Variants + an optimized-HLO op census of the L1-3 model.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_l2.py
"""

import re
import sys
import time
from collections import Counter

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import ipdm_tpu.models.unet as U

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    tvec = jnp.zeros((1,), jnp.int32)

    U.AttentionBlock.__call__ = lambda self, x: x  # timing only

    def build(cm, H, W):
        x1 = jnp.asarray(rng.normal(0, 1, (1, H, W, 1)).astype(np.float32))
        m = U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                        num_res_blocks=2, attention_resolutions=(32,),
                        channel_mult=cm, dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x1, tvec)
        return m, p, x1

    def run(name, cm, H, W, reps=10):
        m, p, x1 = build(cm, H, W)

        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(
                0, reps, lambda i, h: m.apply(p, h, tvec), x)
        y = prog(x1)
        float(jnp.sum(y))
        t0 = time.time()
        x = x1
        for _ in range(3):
            x = prog(x)
        float(jnp.sum(x))
        log(f"{name}: {(time.time()-t0)/3/reps*1e3:7.1f} ms/eval")

    run("L1-2-only (1/16,1/8,1/4)    ",
        (0.0625, 0.125, 0.25), 2000, 912)
    run("L2-3-only @1000x456 (1/8,1/4,2)",
        (0.125, 0.25, 2), 1000, 456)

    # --- optimized-HLO census of the L1-3 model ---------------------------
    m, p, x1 = build((0.0625, 0.125, 0.25, 2), 2000, 912)
    f = jax.jit(lambda h: m.apply(p, h, tvec))
    try:
        txt = f.lower(x1).compile().as_text()
        log(f"HLO: {len(txt.splitlines())} lines")
        ops = Counter()
        big = []
        for line in txt.splitlines():
            mm = re.search(r"= (\w+)\(", line)
            mo = re.search(r"(\w+)\.?\d* = \S*\s*(\w+)", line)
            op = None
            if " = " in line:
                rhs = line.split(" = ", 1)[1]
                mshape = re.match(r"\s*\(?([a-z0-9]+\[[0-9,]*\])", rhs)
                mop = re.search(r"\]\{?[^ ]*\}?\s+(\w+)\(", rhs)
                if mop:
                    op = mop.group(1)
                    ops[op] += 1
                    if mshape:
                        sh = mshape.group(1)
                        nums = re.findall(r"\d+", sh.split("[")[1])
                        n = int(np.prod([int(x) for x in nums])) if nums else 0
                        if n >= 50_000_000 and op in (
                                "copy", "transpose", "bitcast", "reshape",
                                "convert", "pad"):
                            big.append((op, sh))
        log(f"op census: {dict(ops.most_common(20))}")
        log(f"large copy/transpose/pad ops (>=50M elems): {len(big)}")
        for op, sh in big[:25]:
            log(f"   {op} {sh}")
        with open("/tmp/l13_hlo.txt", "w") as fh:
            fh.write(txt)
        log("full HLO -> /tmp/l13_hlo.txt")
    except Exception as e:
        log(f"HLO dump failed: {e}")

    log("done")


if __name__ == "__main__":
    main()
