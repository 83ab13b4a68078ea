"""Test-only stand-in for the `larpix-control` subset the reference imports
(fee.py:15-17).  Packet objects are attribute bags; `hdf5format.to_file`
serializes them through the same on-disk schema as
`larndsim_tpu.io.larpix_packets`, so the golden-parity tests can compare
the reference's export stream field-by-field against ours."""
