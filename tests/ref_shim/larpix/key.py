class Key:
    """`larpix.key.Key` stand-in: (io_group, io_channel, chip_id)."""

    def __init__(self, io_group, io_channel, chip_id):
        self.io_group = int(io_group)
        self.io_channel = int(io_channel)
        self.chip_id = int(chip_id)

    @classmethod
    def from_string(cls, s):
        a, b, c = str(s).split('-')
        return cls(int(a), int(b), int(c))

    def __str__(self):
        return f'{self.io_group}-{self.io_channel}-{self.chip_id}'
