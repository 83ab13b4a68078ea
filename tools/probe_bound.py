"""Decompose the folded induced-current kernel's time by ablation.

Times the production folded:16 kernel on the bench workload with pieces
of the inner loop cut out (LARNDSIM_PALLAS_ABLATE — results are WRONG,
this is a probe, never a production mode):

  full       the production kernel
  noscalar   row_of replaced by 2 scalar ops     -> scalar-core ALU cost
  noblend    roll kept, sublane blend dropped    -> blend (vselect) cost
  noroll     roll + blend dropped                -> lane-roll + blend cost
  fixedload  window loads at a static q offset   -> dynamic-offset cost
  noload     one shared window loaded per group  -> slab load traffic cost

The deltas against `full` give the measured roofline decomposition the
round-2 verdict asked for (BENCHMARKS.md records the result).

Usage:  LARNDSIM_ASSETS=/root/reference/larndsim python tools/probe_bound.py
        [--reps 3] [--ablate full,noscalar,...]
Do not run while a benchmark is in flight — results share the TPU.
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

from perf_guard import build_workload, timed  # noqa: E402


def main():
    reps = 3
    if '--reps' in sys.argv:
        reps = int(sys.argv[sys.argv.index('--reps') + 1])
    modes = 'full,noscalar,noblend,noroll,fixedload,noload'
    if '--ablate' in sys.argv:
        modes = sys.argv[sys.argv.index('--ablate') + 1]

    from larndsim_tpu.ops.current_pallas import current_pallas

    w = build_workload()
    kw = dict(n_steps=w['n_steps'], t_sig=w['t_sig'], mc_smear=True,
              shift_band=w['band'], variant='folded', pix_grp=16,
              min_step=float(w['sim'].min_step_size))
    args = (w['segs'], w['px'], w['py'], w['pix_valid'], w['response'],
            w['det'], w['key'])

    results = []
    base = None
    # the ablation knob is refused by the production kernel without this
    # acknowledgement (results are non-physical by construction)
    os.environ['LARNDSIM_DEBUG_PROBES'] = '1'
    for mode in modes.split(','):
        os.environ['LARNDSIM_PALLAS_ABLATE'] = \
            '' if mode == 'full' else mode
        try:
            ms = timed(current_pallas, *args, reps=reps, **kw)
        except Exception as exc:
            print(f'{mode:>12}:  FAILED ({type(exc).__name__}: {exc})')
            continue
        finally:
            os.environ.pop('LARNDSIM_PALLAS_ABLATE', None)
        if mode == 'full':
            base = ms
        results.append((mode, ms))
    for mode, ms in results:
        delta = f'  (saves {base - ms:7.1f} ms)' \
            if base is not None and mode != 'full' else ''
        print(f'{mode:>12}: {ms:8.1f} ms{delta}')


if __name__ == '__main__':
    main()
