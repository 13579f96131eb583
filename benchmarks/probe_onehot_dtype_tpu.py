"""Probe: lower-precision one-hot operands for the gather/scatter matmuls.

Round-4 verdict item 6 — the last named single-chip lever
(docs/performance.md "different math (e.g. lower-precision one-hots)"):
~37% of the fused forward is one-hot MXU work (gather 15% + scatter 21% +
build 1%, the skip-probe decomposition).  One-hots are exactly 0/1, so if
Mosaic accepted an int8 (or fp8) one-hot against the bf16 value operand the
matmul would be exact while (possibly) running at a higher MXU rate.

This measures a standalone Pallas kernel shaped like the fused kernel's
gather (onehot^T @ band) and scatter (onehot @ msg) at the shipped sizes
(band 512, chunk 1024, latent 128) for each one-hot dtype:

- bf16 (the shipped baseline), f32,
- int8 one-hot x bf16 values (mixed int/float dot),
- float8_e4m3fn one-hot x bf16 values,
- int8 x int8 (BOTH operands quantized — NOT numerically exact for values;
  included only to see whether an int8 path would even be faster).

Compile failures are the expected refutation evidence (v5e MXU pairs int8
with int8 and bf16 with bf16; mixed dots usually force a convert that
erases any win).  Writes benchmarks/results/ONEHOT_DTYPE_probe.json.
"""

import functools
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

BAND = int(os.environ.get("MGN_PROBE_BAND", 512))
CHUNK = int(os.environ.get("MGN_PROBE_CHUNK", 1024))
LATENT = 128
ROUNDS = int(os.environ.get("MGN_PROBE_ROUNDS", 200))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    results = {"backend": jax.default_backend(),
               "shape": {"band": BAND, "chunk": CHUNK, "latent": LATENT},
               "variants": {}}

    rng = np.random.default_rng(0)
    rel = rng.integers(0, BAND, CHUNK).astype(np.int32)
    band = rng.standard_normal((BAND, LATENT)).astype(np.float32)
    msg = rng.standard_normal((CHUNK, LATENT)).astype(np.float32)

    def kernel(oh_dtype, val_dtype, rel_ref, band_ref, msg_ref, out_ref):
        out_ref[...] = jnp.zeros((BAND, LATENT), jnp.float32)
        relv = rel_ref[0, :]
        for _ in range(ROUNDS):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (BAND, CHUNK), 0)
                  == relv[None, :]).astype(oh_dtype)
            vs = jax.lax.dot_general(  # gather: onehot^T @ band
                oh, band_ref[...].astype(val_dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(  # scatter: onehot @ msg
                oh, msg_ref[...].astype(val_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            out_ref[...] += vs[:BAND, :] + contrib
            # vary rel so the one-hot build cannot be hoisted
            relv = (relv + 1) % BAND

    variants = {
        "bf16": (jnp.bfloat16, jnp.bfloat16),
        "f32": (jnp.float32, jnp.float32),
        "int8_mixed": (jnp.int8, jnp.bfloat16),
        "fp8_mixed": (jnp.float8_e4m3fn, jnp.bfloat16),
        # the kernel's per-site operand realities (round-4 follow-up):
        # preproject gather = oh x f32 band; scatter = oh x bf16 msg
        "f32oh_bf16val": (jnp.float32, jnp.bfloat16),
        "fp8oh_f32val": (jnp.float8_e4m3fn, jnp.float32),
        "bf16oh_f32val": (jnp.bfloat16, jnp.float32),
        "int8_int8": (jnp.int8, jnp.int8),
    }
    # Build + compile everything FIRST, then time variants INTERLEAVED over
    # several passes taking per-variant minima: the shared/tunneled chip's
    # throughput drifts between calls (measured 164 -> 1304 us on the SAME
    # compiled f32 kernel across two sequential runs), so only interleaved
    # sampling isolates the dtype effect from chip-state drift.
    args = (jnp.asarray(rel)[None], jnp.asarray(band), jnp.asarray(msg))
    calls, outs = {}, {}
    ref_out = None
    for name, (oh_dt, val_dt) in variants.items():
        try:
            fn = pl.pallas_call(
                functools.partial(kernel, oh_dt, val_dt),
                out_shape=jax.ShapeDtypeStruct((BAND, LATENT), jnp.float32),
                interpret=interpret,
            )
            call = jax.jit(lambda r, b, m, fn=fn: fn(r, b, m))
            outs[name] = np.asarray(jax.device_get(call(*args)))
            calls[name] = call
            if name == "bf16":
                ref_out = outs[name]
        except Exception as ex:
            results["variants"][name] = {"error": str(ex)[:400]}
            print(name, "FAILED:", str(ex)[:200], flush=True)

    best = {name: float("inf") for name in calls}
    for _ in range(8):  # interleaved passes
        for name, call in calls.items():
            t0 = time.perf_counter()
            jax.device_get(call(*args))
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, b in best.items():
        per_pair = b / ROUNDS
        flops = 2 * BAND * CHUNK * LATENT * 2  # gather + scatter
        rec = {"us_per_round": round(per_pair * 1e6, 2),
               "tflops": round(flops / per_pair / 1e12, 2)}
        if name != "bf16" and ref_out is not None \
                and variants[name][1] != jnp.int8:
            rec["max_abs_diff_vs_bf16"] = float(
                np.abs(outs[name] - ref_out).max())
        results["variants"][name] = rec
        print(name, rec, flush=True)

    bl = results["variants"].get("bf16", {})
    if "us_per_round" in bl:
        for name, rec in results["variants"].items():
            if "us_per_round" in rec:
                rec["speedup_vs_bf16"] = round(
                    bl["us_per_round"] / rec["us_per_round"], 3)
    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "ONEHOT_DTYPE_probe.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
