from hlax.data.reader import HeterogeneousData, read_data, encode_raw  # noqa: F401
