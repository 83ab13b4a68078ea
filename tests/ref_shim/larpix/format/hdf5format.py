"""`larpix.format.hdf5format.to_file` stand-in: serializes shim packet
objects into the same `packets` structured dataset our native writer
produces (larndsim_tpu/io/larpix_packets.py), so reference-exported and
natively-exported streams compare field-by-field."""
import numpy as np

from larndsim_tpu.io import larpix_packets as lp


def to_file(filename, packet_list, workers=1):
    packets = packet_list.packets
    rows = lp.empty_packets(len(packets))
    for i, p in enumerate(packets):
        row = rows[i]
        row['packet_type'] = p.packet_type
        if p.packet_type == 0:  # Packet_v2 data
            key = p.chip_key
            row['io_group'] = key.io_group
            row['io_channel'] = key.io_channel
            row['chip_id'] = key.chip_id
            row['channel_id'] = p.channel_id
            row['timestamp'] = int(p.timestamp)
            row['dataword'] = int(p.dataword) & 0xFF
            row['first_packet'] = p.first_packet
            row['receipt_timestamp'] = int(p.receipt_timestamp)
            row['parity'] = p.parity
            row['valid_parity'] = 1
        elif p.packet_type == 4:  # timestamp
            row['timestamp'] = np.uint64(p.timestamp)
            if p.chip_key is not None:
                row['io_group'] = p.chip_key.io_group
        elif p.packet_type == 6:  # sync
            row['timestamp'] = np.uint64(p.timestamp)
            row['io_group'] = p.io_group
            row['trigger_type'] = p.sync_type[0]
        elif p.packet_type == 7:  # trigger
            row['timestamp'] = np.uint64(p.timestamp)
            row['io_group'] = p.io_group
            row['trigger_type'] = p.trigger_type[0]
    lp.to_file(filename, rows)
