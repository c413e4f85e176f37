"""Microbench: what does the per-triangle f32 DIVIDE cost in the
window sweep's Moller-Trumbore inner loop on the TPU VPU?

The round-5 breakdown puts the window sweep residual at 30.8 ms/frame
on mesh_big, and an op-count model (~2.06e9 lane-tri tests x ~55 VPU
ops at ~3.9e12 ops/s) reproduces it — the sweep is VPU-op-bound. A
division-free variant (deferred division, cross-multiplied compares)
would save the divide but is NOT bit-exact at mesh seams (near-tie
winner flips where two triangles share an edge), so before paying
that exactness price we measure what the divide actually costs:

  variant A — the real _mt_chunk body (inv_det = 1/det),
  variant B — same body with the divide replaced by a MULTIPLY
              (semantically wrong, timing-only),
  variant C — variant A with the (row, pos) defer carries packed
              into one word (4 selects instead of 5, bit-exact).

Each kernel sweeps CHUNKS*8-row blocks x REPS over resident dummy
data, so the measured delta is pure VPU schedule. Run on hardware;
interpret mode tells nothing about Mosaic's divide lowering.

Usage: python tools/bench_mt.py    (ONE TPU process at a time)
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANE = 128
TRI_ROW = 4
CHUNK = 32
N_CHUNKS = 32          # one supernode's worth (1024 tris)
REPS = 64              # supers swept per kernel call
RAY_EPS = 1e-4


def mt_loop(blk, qox, qoy, qoz, qdx, qdy, qdz, carry, div, packwin):
    for k in range(CHUNK):
        if packwin:
            bt2, brp2, bu2, bv2 = carry
        else:
            bt2, brow2, bpos2, bu2, bv2 = carry
        r, c0 = k // TRI_ROW, 24 * (k % TRI_ROW)
        tv = lambda j: blk[r, c0 + j]
        v0x, v0y, v0z = tv(0), tv(1), tv(2)
        e1x, e1y, e1z = tv(3), tv(4), tv(5)
        e2x, e2y, e2z = tv(6), tv(7), tv(8)
        pvx = qdy * e2z - qdz * e2y
        pvy = qdz * e2x - qdx * e2z
        pvz = qdx * e2y - qdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        if div:
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / det, 0.0
            )
        else:  # timing stand-in: same dataflow, no divide
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, det * 1.0000001, 0.0
            )
        tvx = qox - v0x
        tvy = qoy - v0y
        tvz = qoz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (qdx * qvx + qdy * qvy + qdz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        better = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0) & (v >= 0) & (u + v <= 1)
            & (t > RAY_EPS) & (t < bt2)
        )
        if packwin:
            rp = jnp.float32(4 * (k // TRI_ROW) + k % TRI_ROW)
            carry = (
                jnp.where(better, t, bt2),
                jnp.where(better, rp, brp2),
                jnp.where(better, u, bu2),
                jnp.where(better, v, bv2),
            )
        else:
            carry = (
                jnp.where(better, t, bt2),
                jnp.where(better, jnp.float32(k // TRI_ROW), brow2),
                jnp.where(better, jnp.float32(k % TRI_ROW), bpos2),
                jnp.where(better, u, bu2),
                jnp.where(better, v, bv2),
            )
    return carry


def make_kernel(div, packwin):
    nc = 4 if packwin else 5

    def kern(tri_ref, q_ref, o_ref):
        q = lambda j: q_ref[:, j * LANE:(j + 1) * LANE]
        zz = jnp.zeros((8, LANE), jnp.float32)
        carry = (jnp.full((8, LANE), 3.4e38, jnp.float32),) + tuple(
            zz for _ in range(nc - 1)
        )

        def super_body(s, carry):
            def chunk_body(c, carry):
                blk = tri_ref[pl.ds(c * (CHUNK // TRI_ROW),
                                    CHUNK // TRI_ROW), :]
                return mt_loop(
                    blk, q(0), q(1), q(2), q(3), q(4), q(5),
                    carry, div, packwin,
                )

            return jax.lax.fori_loop(0, N_CHUNKS, chunk_body, carry)

        carry = jax.lax.fori_loop(0, REPS, super_body, carry)
        for j in range(nc):
            o_ref[:, j * LANE:(j + 1) * LANE] = carry[j]

    rows = N_CHUNKS * (CHUNK // TRI_ROW)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, nc * LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec((rows, 96), lambda: (0, 0)),
            pl.BlockSpec((8, 6 * LANE), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, nc * LANE), lambda: (0, 0)),
    )


def main():
    key = jax.random.PRNGKey(0)
    rows = N_CHUNKS * (CHUNK // TRI_ROW)
    tri = jax.random.uniform(key, (rows, 96), jnp.float32, -1.0, 1.0)
    q = jax.random.uniform(key, (8, 6 * LANE), jnp.float32, -1.0, 1.0)

    results = {}
    for name, div, packwin in (
        ("A divide (shipping)", True, False),
        ("B no-divide stand-in", False, False),
        ("C divide + packed row/pos", True, True),
    ):
        fn = jax.jit(make_kernel(div, packwin))
        out = fn(tri, q)
        float(jnp.sum(out))  # flush tunnel
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(tri, q)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / 8
        tests = 8 * LANE * CHUNK * N_CHUNKS * REPS
        results[name] = dt
        print(f"{name:28s} {dt*1e3:7.3f} ms  "
              f"{dt/tests*1e12:6.2f} ps/lane-tri", flush=True)

    a = results["A divide (shipping)"]
    # mesh_big lane-tri tests/frame, calibrated from the measured
    # sweep residual (~26 ms ex key sort) / variant A's ps/test —
    # NOT the naive 1967-blocks x 1024-tris model, which overcounts
    # ~5x (window blocks sweep supers with fewer live chunks).
    tests_frame = 26e-3 / (a / (8 * LANE * CHUNK * N_CHUNKS * REPS))
    for k, v in results.items():
        if k[0] != "A":
            dps = (a - v) / (8 * LANE * CHUNK * N_CHUNKS * REPS)
            print(f"{k[0]} vs A: {100*(a-v)/a:+.1f}%  ->  "
                  f"{dps*tests_frame*1e3:+.2f} ms/frame on mesh_big",
                  flush=True)


if __name__ == "__main__":
    main()
