from davinci_tpu.ntt.ntt import DeviceNTT, get_device_ntt

__all__ = ["DeviceNTT", "get_device_ntt"]
