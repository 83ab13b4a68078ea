from . import hdf5format  # noqa: F401
