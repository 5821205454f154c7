from davinci_tpu.ff.mod import DeviceField, get_device_field

__all__ = ["DeviceField", "get_device_field"]
