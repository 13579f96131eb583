"""Probe: Mosaic ``tpu.dynamic_gather`` vs the one-hot gather matmul.

The fused round kernel's sender/receiver gathers are banded one-hot matmuls
(TPU historically had no vector gather) — measured 15% of the forward plus
the one-hot build's VPU work (docs/performance.md).  Newer Mosaic lowers
``jnp.take_along_axis(x, idx, axis=0, mode="promise_in_bounds")`` on 2-D VMEM
values to a native ``tpu.dynamic_gather`` (sublane shuffle, VPU): this probe
times both on realistic fused-kernel shapes to decide whether the kernel
should switch.

Variants (all (chunk, L) gathers from a (chunk, L) window, C chunks x R
rounds inside one kernel so per-launch overhead is amortized):

- ``onehot``:  iota==rel compare + (chunk, band) @ (band, L) MXU matmul
  (the current kernel's op pair, band <= chunk),
- ``dyn``:     broadcast rel to (chunk, L) + take_along_axis,
- ``dyn_f32`` / ``dyn_bf16``: source dtype sweep (the preproject path
  gathers f32 scratch; the plain path gathers compute-dtype latents).

Run detached: nohup timeout 900 python benchmarks/probe_dyngather_tpu.py &
"""

import functools
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

CHUNK = int(os.environ.get("MGN_PROBE_CHUNK", "1024"))
BAND = int(os.environ.get("MGN_PROBE_BAND", "384"))
C = int(os.environ.get("MGN_PROBE_CHUNKS", "11"))
R = int(os.environ.get("MGN_PROBE_ROUNDS", "15"))
L = 128
N = 2048


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    rng = np.random.default_rng(0)
    # diagonal-ish relative indices, like a sweep-ordered mesh band
    rel = np.minimum(
        np.maximum(rng.normal(BAND // 2, BAND // 6, size=(C, CHUNK)), 0),
        BAND - 1).astype(np.int32)
    starts = (np.arange(C) * ((N - CHUNK) // max(C - 1, 1))).astype(np.int32)
    starts = (starts // 32) * 32

    def make(variant, dtype):
        def kernel(starts_ref, v_ref, rel_ref, relt_ref, out_ref, acc_ref):
            def chunk_body(c, _):
                ss = pl.multiple_of(starts_ref[c], 32)
                if variant == "onehot":
                    relc = rel_ref[c]
                    win = v_ref[pl.ds(ss, BAND), :]
                    oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (BAND, CHUNK), 0)
                        == relc[None, :]).astype(dtype)
                    g = jax.lax.dot_general(
                        oh, win, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    # rel arrives TRANSPOSED (chunk on sublanes): a (1, chunk)
                    # lane-vector cannot be reshaped to (chunk, 1) in Mosaic
                    # ("unsupported shape cast")
                    relc = relt_ref[:, pl.ds(c, 1)]  # (CHUNK, 1) i32
                    win = v_ref[pl.ds(ss, CHUNK), :]
                    idx = jnp.broadcast_to(relc, (CHUNK, L))[:, :, None]
                    dn = jax.lax.GatherDimensionNumbers(
                        offset_dims=(), collapsed_slice_dims=(0,),
                        start_index_map=(0,), operand_batching_dims=(1,),
                        start_indices_batching_dims=(1,))
                    g = jax.lax.gather(
                        win, idx, dn, (1, 1),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
                    ).astype(jnp.float32)
                acc_ref[:] += g
                return 0

            jax.lax.fori_loop(0, C, chunk_body, 0, unroll=True)
            r = pl.program_id(0)

            @pl.when(r == R - 1)
            def _():
                out_ref[:] = acc_ref[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((N, L), lambda g, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, CHUNK), lambda g, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, C), lambda g, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, L), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((CHUNK, L), jnp.float32)],
        )
        f = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((CHUNK, L), jnp.float32),
            interpret=backend != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
        )
        v = jnp.asarray(rng.normal(size=(N, L)), dtype)
        reli = jnp.asarray(rel)
        relt = jnp.asarray(np.ascontiguousarray(rel.T))
        st = jnp.asarray(starts)

        @jax.jit
        def loop(v):
            def body(_, acc):
                return acc + f(st, v, reli, relt)

            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((CHUNK, L), jnp.float32))

        return loop, v

    ITERS = 50 if backend == "tpu" else 1
    results = {"backend": backend, "chunk": CHUNK, "band": BAND,
               "chunks": C, "rounds": R, "iters": ITERS}
    ref = None
    combos = (("onehot_f32", "onehot", jnp.float32),
              ("onehot_bf16", "onehot", jnp.bfloat16),
              ("dyn_f32", "dyn", jnp.float32),
              ("dyn_bf16", "dyn", jnp.bfloat16))
    only = os.environ.get("MGN_PROBE_ONLY")
    if only:
        combos = tuple(c for c in combos if c[0] in only.split(","))
    for name, variant, dtype in combos:
        try:
            loop, v = make(variant, dtype)
            out = np.asarray(jax.device_get(loop(v)))  # compile + force
            if variant == "onehot" and dtype == jnp.float32:
                ref = out
            elif ref is not None:
                err = float(np.abs(out - ref).max() / np.abs(ref).max())
                results.setdefault("rel_err_vs_onehot_f32", {})[name] = \
                    round(err, 5)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(loop(v))
                best = min(best, time.perf_counter() - t0)
            per_gather = best / (ITERS * R * C)
            results[name] = {"us_per_gather": round(per_gather * 1e6, 3),
                             "ms_total": round(best * 1e3, 3)}
            print(name, results[name], flush=True)
        except Exception as ex:
            results[name] = {"error": str(ex)[:400]}
            print(name, "FAILED, full error follows", flush=True)
            print(str(ex), flush=True)

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "DYNGATHER_probe.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
