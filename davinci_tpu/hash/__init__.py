from davinci_tpu.hash.poseidon import (
    DevicePoseidon,
    get_device_poseidon,
    poseidon_hash,
    multi_poseidon,
)

__all__ = [
    "DevicePoseidon",
    "get_device_poseidon",
    "poseidon_hash",
    "multi_poseidon",
]
