"""Failure types (parity: mimic/utils/exceptions.py:1-6). CUDA OOM has no
TPU analog — XLA plans memory statically at compile time — but the batch
autotune supervisor reuses DeviceOutOfMemory for compile-time OOM."""


class NaNInLatent(Exception):
    pass


class DeviceOutOfMemory(Exception):
    pass
