"""A/B timing lab for induced-current Pallas kernel variants.

Times each (variant, pix_grp, t_blk) combination at the bench's grouped
workload (tools/perf_guard.build_workload) using the output-scalar-pull
method (the only honest timing on the axon tunnel — BENCHMARKS.md
"Measurement methodology"), and prints a ranked table.  Purely a tuning
tool: it never writes PERF_LOG.jsonl.

Usage:  LARNDSIM_ASSETS=/root/reference/larndsim python tools/kernel_lab.py
        [--reps 3] [--combos rows:4,rows:8,folded:4,folded:8]
Do not run while a benchmark is in flight — results share the TPU.
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

import numpy as np

from perf_guard import build_workload, timed  # noqa: E402


def main():
    reps = 3
    if '--reps' in sys.argv:
        reps = int(sys.argv[sys.argv.index('--reps') + 1])
    combos = 'rows:4,rows:8,folded:4,folded:8,foldedT:4,foldedT:8'
    if '--combos' in sys.argv:
        combos = sys.argv[sys.argv.index('--combos') + 1]

    from larndsim_tpu.ops.current_pallas import current_pallas

    w = build_workload()
    kw = dict(n_steps=w['n_steps'], t_sig=w['t_sig'], mc_smear=True,
              shift_band=w['band'],
              min_step=float(w['sim'].min_step_size))
    if '--t_blk' in sys.argv:
        kw['t_blk'] = int(sys.argv[sys.argv.index('--t_blk') + 1])
    args = (w['segs'], w['px'], w['py'], w['pix_valid'], w['response'],
            w['det'], w['key'])

    def parse(combo):
        parts = combo.split(':')
        variant, grp = parts[0], int(parts[1])
        return variant, grp

    baseline = None
    results = []
    for combo in combos.split(','):
        variant, grp = parse(combo)
        try:
            ms = timed(current_pallas, *args, variant=variant, pix_grp=grp,
                       reps=reps, **kw)
        except Exception as exc:  # one OOM combo must not kill the sweep
            print(f'{combo:>16}: FAILED ({type(exc).__name__}: '
                  f'{str(exc)[:120]})', flush=True)
            continue
        if baseline is None:
            baseline = ms
        results.append((combo, ms))
        print(f'{combo:>16}: {ms:8.1f} ms   ({baseline / ms:.2f}x vs '
              f'{combos.split(",")[0]})', flush=True)

    # cross-check: every combo must match an independently computed
    # rows:4 reference bit-for-bit
    ref = np.asarray(current_pallas(*args, variant='rows', pix_grp=4, **kw))
    for combo, _ in results:
        variant, grp = parse(combo)
        got = np.asarray(current_pallas(*args, variant=variant,
                                        pix_grp=grp, **kw))
        same = np.array_equal(ref, got)
        print(f'{combo:>16}: identical to rows:4 -> {same}')
        assert same, f'{combo} output differs from rows:4'


if __name__ == '__main__':
    main()
