"""Micro-benchmark: Pallas TPU scalar-store throughput into a VMEM tile.

Decides the round-5 scatter-fusion question (VERDICT item 2): can
band-local event stores inside the tail kernel beat the XLA scatter's
measured 4.7 ns/lane serialized unique-index floor?  The fused design
would replace the packed-map HBM round trip (zero-init + 28k HBM stores
+ tail band DMA reads) with per-band VMEM stores, so its break-even
store rate is HIGHER than 4.7 ns/lane -- but the stores run on the
scalar unit (no VPU scatter on TPU), so the rate must be measured, not
assumed.

Measured on TPU v5 lite (2026-08-19, eval/bench_store_loop_r05.json):
the minimal EXPRESSIBLE per-event store is an (8,128)-tile
read-modify-write (Mosaic rejects (1,1) stores at dynamic columns and
(1,128) RMW at dynamic rows), and it costs 5.2-6.9 ns/event in stores
alone -- above the 4.7 ns/lane of the COMPLETE XLA scatter fusion at ESL
scale.  The fused band scatter is therefore a measured negative result:
the XLA sort-free runs scatter stays.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )

    N = 28 * 1024  # ESL-like event count per frame
    H, W = 64, 1152  # one tail band of the ESL crop
    rng = np.random.default_rng(0)
    rows = rng.integers(0, H, N).astype(np.int32)
    cols = rng.integers(0, W, N).astype(np.int32)
    vals = rng.integers(1, 1 << 30, N).astype(np.uint32)

    def kernel_rowcol(row_ref, col_ref, val_ref, out_ref, *, n, unroll):
        # Mosaic REJECTS a direct (1,1) store at a dynamic column ("cannot
        # statically prove that index in dimension 1 is a multiple of
        # 128") -- TPU has no scalar/scatter store into VMEM.  The only
        # expressible per-event store is a read-modify-write of the
        # 128-aligned lane group containing the target: load (1,128),
        # select the lane, store back.
        # ... and the (1,128) RMW load at a dynamic row is rejected too
        # ("dynamic load with unaligned indices"): VMEM dynamic access is
        # (8,128)-granule only.  The minimal expressible per-event store
        # is an (8,128) tile read-modify-write.
        out_ref[...] = jnp.zeros_like(out_ref)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, _):
            base = i * unroll
            for u in range(unroll):
                j = base + u
                r = row_ref[j]
                c = col_ref[j]
                v = val_ref[j]
                g = pl.multiple_of((c >> 7) * 128, 128)
                rg = pl.multiple_of((r >> 3) * 8, 8)
                cur = out_ref[pl.ds(rg, 8), pl.ds(g, 128)]
                hit = (sub_iota == (r & 7)) & (lane_iota == (c & 127))
                out_ref[pl.ds(rg, 8), pl.ds(g, 128)] = jnp.where(
                    hit, jnp.uint32(v), cur
                )
            return 0

        jax.lax.fori_loop(0, n // unroll, body, 0)

    def build(unroll):
        return pl.pallas_call(
            functools.partial(kernel_rowcol, n=N, unroll=unroll),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint32),
        )

    dev = jax.devices()[0]
    rows_d, cols_d, vals_d = jax.device_put((rows, cols, vals), dev)

    def time_fn(kernel_fn, iters=5):
        """Tunnel-proof device timing: one jitted program running the
        kernel `reps` times back to back (fresh vals per rep defeats
        CSE); device time = (t(reps=12) - t(reps=2)) / 10, min over
        iters (see memory: per-call timing is swamped by ~1-2 ms RPC
        issuance)."""

        def group(reps):
            @jax.jit
            def g(r, c, v):
                acc = jnp.uint32(0)
                for i in range(reps):
                    out = kernel_fn(r, c, v + jnp.uint32(i + 1))
                    acc = acc + out[0, 0]
                return acc

            return g

        g2, g12 = group(2), group(82)
        jax.block_until_ready(g2(rows_d, cols_d, vals_d))
        jax.block_until_ready(g12(rows_d, cols_d, vals_d))
        best = np.inf
        for _ in range(iters):
            t0 = time.perf_counter()
            int(g2(rows_d, cols_d, vals_d))
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(g12(rows_d, cols_d, vals_d))
            t12 = time.perf_counter() - t0
            best = min(best, (t12 - t2) / 80)
        return best

    results = {
        "note": "unroll=1 is excluded from differencing: its Mosaic "
        "codegen is pathological (~8 us/store measured per-call), so an "
        "82-rep group exceeds the tunnel's timing stability window",
    }
    for unroll in (2, 4, 8):
        fn = build(unroll)
        dt = time_fn(fn)
        results[f"pallas_unroll{unroll}_ns_per_store"] = dt / N * 1e9
        print(f"unroll={unroll}: {dt * 1e6:8.1f} us/frame, "
              f"{dt / N * 1e9:6.2f} ns/store", flush=True)

    # XLA unique-indices scatter-set baseline at the same shape
    def xla_scatter(r, c, v):
        out = jnp.zeros((H, W), jnp.uint32)
        return out.at[r, c].set(v, mode="drop", unique_indices=True)

    dt = time_fn(xla_scatter)
    results["xla_set_ns_per_store"] = dt / N * 1e9
    print(f"XLA set : {dt * 1e6:8.1f} us/frame, {dt / N * 1e9:6.2f} ns/store")

    import json

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
