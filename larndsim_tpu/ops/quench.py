"""Recombination (quenching): dE/dEdx -> electrons and photons.

Physics identical to the reference kernel (quenching.py:11-44): Box model
(Baller 2013 JINST 8 P08005) or Birks model (Amoruso et al NIM A 523 (2004)
275).  Implemented as a pure element-wise function over the segment batch —
XLA fuses it with neighbours; no custom kernel is warranted.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import physics
from ..params.detector import DetectorParams
from ..segments import Segments


def quench(segs: Segments, det: DetectorParams, mode: int,
           w_ph: float = 19.5e-6, scint_prescale: float = 1.0) -> Segments:
    """Apply recombination and compute photon yield.

    Args:
        segs: segment batch.
        det: detector params (E field, LAr density via constant).
        mode: ``physics.BOX`` or ``physics.BIRKS`` (static).
        w_ph: ion+excitation work function [MeV] (consts/light.py:20).
        scint_prescale: scintillation prescale (consts/light.py:18).
    """
    lar_density = 1.38  # g/cm^3 (consts/detector.py:19)
    dEdx = segs.dEdx
    dE = segs.dE

    if mode == physics.BOX:
        csi = physics.BOX_BETA * dEdx / (det.e_field * lar_density)
        # log(alpha + csi)/csi, clamped at 0; the csi->0 limit is
        # log(alpha) < 0 so the clamp also covers the 0/0 case.
        recomb = jnp.maximum(0.0, jnp.log(physics.BOX_ALPHA + csi)
                             / jnp.where(csi == 0, 1.0, csi))
        recomb = jnp.where(csi == 0, 0.0, recomb)
    elif mode == physics.BIRKS:
        recomb = physics.BIRKS_Ab / (1 + physics.BIRKS_kb * dEdx
                                     / (det.e_field * lar_density))
    else:
        raise ValueError("mode must be physics.BOX or physics.BIRKS")

    n_electrons = recomb * dE / physics.W_ION
    n_photons = (dE / w_ph - n_electrons) * scint_prescale
    return segs.replace(n_electrons=n_electrons.astype(jnp.float32),
                        n_photons=n_photons.astype(jnp.float32))
