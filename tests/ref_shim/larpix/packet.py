"""Packet classes covering the attribute surface fee.py touches
(/root/reference/larndsim/fee.py:227-268, :385, :451-460)."""
from .key import Key


class Packet_v2:
    packet_type = 0

    def __init__(self):
        self.dataword = 0
        self.timestamp = 0
        self.receipt_timestamp = 0
        self.channel_id = 0
        self.first_packet = 0
        self.packet_type = 0
        self._chip_key = None
        self.parity = 0

    @property
    def chip_key(self):
        return self._chip_key

    @chip_key.setter
    def chip_key(self, value):
        self._chip_key = (value if isinstance(value, Key)
                          else Key.from_string(value))

    def assign_parity(self):
        # real odd parity over the UART payload word (same layout as
        # larndsim_tpu.io.larpix_packets._packet_v2_parity)
        key = self._chip_key
        w = ((int(self.packet_type) & 0x3)
             | ((key.chip_id & 0xFF) << 2)
             | ((int(self.channel_id) & 0x3F) << 10)
             | ((int(self.timestamp) & 0x7FFFFFFF) << 16)
             | ((int(self.first_packet) & 1) << 47)
             | ((int(self.dataword) & 0xFF) << 48))
        self.parity = 1 - (bin(w).count('1') & 1)


class TimestampPacket:
    packet_type = 4

    def __init__(self, timestamp=0):
        self.timestamp = timestamp
        self.chip_key = None


class SyncPacket:
    packet_type = 6

    def __init__(self, sync_type=b'S', timestamp=0, io_group=1):
        self.sync_type = sync_type
        self.timestamp = timestamp
        self.io_group = io_group


class TriggerPacket:
    packet_type = 7

    def __init__(self, io_group=1, trigger_type=b'\x02', timestamp=0):
        self.io_group = io_group
        self.trigger_type = trigger_type
        self.timestamp = timestamp


class PacketCollection:
    def __init__(self, packets, read_id=0, message=''):
        self.packets = list(packets)
        self.read_id = read_id
        self.message = message
