"""larndsim_tpu: TPU-native pixelated-LArTPC simulator.

Capability-complete rebuild of DUNE's larnd-sim on JAX/XLA/Pallas: edep-sim
energy-deposit segments in, LArPix charge-readout packets and SiPM
light-readout waveforms out, with MC-truth backtracking.  See README.md for
the architecture and PARITY.md for the component-by-component mapping to
the reference.
"""

__version__ = '0.1.0'
