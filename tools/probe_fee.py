"""Ablation probe for the FEE FSM Pallas kernel (non-physical outputs).

Times stripped-down variants of ops/fee_pallas.py's kernel to attribute
its per-tick cost.  Run on hardware: python tools/probe_fee.py
"""
from __future__ import annotations

import functools
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, 'tools'))
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_guard import timed  # noqa: E402

TILE = 1024
CHUNK = 256


def make_call(ablate: str, n_scan_p, U, max_adc, n_scan):
    spb = TILE // 128
    l128 = U // 128
    n_u, n_c = U // TILE, n_scan_p // CHUNK

    def kernel(*allrefs):
        if 'consts' in ablate:
            scal_ref, times_ref, thr_ref, q0_ref, sig_ref, noise_ref = \
                allrefs[:6]
            rest = allrefs[6:]
        else:
            sig_ref, noise_ref = allrefs[:2]
            rest = allrefs[2:]
        out_ref = rest[0]
        rest = rest[1:]
        if 'outs' in ablate:
            o1, o2, o3, o4, fstate, istate = rest
        else:
            fstate, istate = rest
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            fstate[...] = jnp.zeros((8, 8, 128), jnp.float32)
            istate[...] = jnp.zeros((4, 8, 128), jnp.int32)
            out_ref[...] = jnp.zeros((1, spb, 128), jnp.float32)
            if 'outs' in ablate:
                for o in (o1, o3):
                    o[...] = jnp.zeros((30, spb, 128), jnp.float32)
                for o in (o2, o4):
                    o[...] = jnp.full((30, spb, 128), -1, jnp.int32)

        def tick(i, _):
            t = c * CHUNK + i
            if 'noguard' not in ablate:
                guard = pl.when(t < n_scan)
            else:
                guard = pl.when(t >= 0)

            @guard
            def _():
                if 'nosig' in ablate:
                    curre_t = fstate[7]
                else:
                    curre_t = sig_ref[i].reshape(8, 128)
                if 'nonoise' in ablate:
                    rows = [fstate[7]] * 5
                else:
                    rows = [noise_ref[i, j].reshape(8, 128)
                            for j in range(5)]
                if 'nostate' in ablate:
                    fstate[0] = curre_t + rows[0] + rows[1] + rows[2] \
                        + rows[3] + rows[4]
                elif 'intops' in ablate:
                    # int32 state machine ops: counters + mask selects,
                    # mirroring the FSM's istate usage
                    b0 = istate[0]; i0 = istate[1]; s0 = istate[2]
                    skipping = s0 > 0
                    integrating = i0 > 0
                    ir = jnp.where(integrating & ~skipping, i0 - 1, i0)
                    latch = integrating & ~skipping & (ir == 0)
                    a = fstate[0] * 0.99 + curre_t
                    fire = (~skipping & ~integrating
                            & (a + rows[0] >= rows[1]))
                    ir = jnp.where(fire, 7, ir)
                    sr = jnp.where(s0 > 0, s0 - 1, 0)
                    sr = jnp.where(latch, 3, sr)
                    lr = jnp.where(latch, t + 4, istate[3])
                    busy = jnp.where(~skipping & ~integrating,
                                     jnp.maximum(b0 - 1, 0), b0)
                    busy = jnp.where(latch, 9, busy)
                    fstate[0] = jnp.where(latch, 0.0, a)
                    istate[0] = busy
                    istate[1] = ir
                    istate[2] = sr
                    istate[3] = lr
                else:
                    a = fstate[0] * 0.99 + curre_t
                    b = jnp.where(a > 0.5, fstate[1] + rows[0], fstate[1])
                    cc = jnp.where(a > 0.5, fstate[2] + rows[1], fstate[2])
                    d = jnp.where(b > cc, fstate[3] + rows[2], fstate[3])
                    e = jnp.where(d > 0, fstate[4] + rows[3], fstate[4])
                    f = jnp.where(e > 0, fstate[5] + rows[4], fstate[5])
                    g = jnp.where(f > 1e9, 0.0, fstate[6] + 1.0)
                    if 'anyred' in ablate:
                        s = jnp.any(b > 1e30)

                        @pl.when(s)
                        def _():
                            fstate[7] = fstate[7] + 1.0
                    fstate[0] = a
                    fstate[1] = b
                    fstate[2] = cc
                    fstate[3] = d
                    fstate[4] = e
                    fstate[5] = f
                    fstate[6] = g
            return 0

        jax.lax.fori_loop(0, CHUNK, tick, 0)

        @pl.when(c == n_c - 1)
        def _():
            out_ref[0] = fstate[0]

    call = pl.pallas_call(
        kernel,
        grid=(n_u, n_c),
        in_specs=([
            pl.BlockSpec((1, 6), lambda u, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2049), lambda u, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spb, 128), lambda u, c: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spb, 128), lambda u, c: (0, u, 0),
                         memory_space=pltpu.VMEM),
        ] if 'consts' in ablate else []) + [
            pl.BlockSpec((CHUNK, spb, 128), lambda u, c: (c, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 5, spb, 128), lambda u, c: (c, 0, u, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, spb, 128), lambda u, c: (0, u, 0),
                                memory_space=pltpu.VMEM)]
        + ([pl.BlockSpec((30, spb, 128), lambda u, c: (0, u, 0),
                         memory_space=pltpu.VMEM)] * 4
           if 'outs' in ablate else []),
        out_shape=[jax.ShapeDtypeStruct((1, l128, 128), jnp.float32)]
        + ([jax.ShapeDtypeStruct((30, l128, 128), jnp.float32),
            jax.ShapeDtypeStruct((30, l128, 128), jnp.int32),
            jax.ShapeDtypeStruct((30, l128, 128), jnp.float32),
            jax.ShapeDtypeStruct((30, l128, 128), jnp.int32)]
           if 'outs' in ablate else []),
        scratch_shapes=[pltpu.VMEM((8, 8, 128), jnp.float32),
                        pltpu.VMEM((4, 8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )
    return jax.jit(call)


def main():
    U, n_scan = 16384, 3805
    n_scan_p = 3840
    sig = jnp.zeros((n_scan_p, U // 128, 128), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (n_scan_p, 5, U // 128, 128))
    scal = jnp.zeros((1, 6), jnp.float32)
    times = jnp.zeros((1, 2049), jnp.float32)
    thrq = jnp.zeros((1, U // 128, 128), jnp.float32)
    for ablate in ('full', 'full+consts'):
        fn = make_call(ablate, n_scan_p, U, 30, n_scan)
        args = ((scal, times, thrq, thrq, sig, noise)
                if 'consts' in ablate else (sig, noise))
        ms = timed(fn, *args)
        print(f'{ablate:>24}: {ms:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
