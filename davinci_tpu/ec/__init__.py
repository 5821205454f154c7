from davinci_tpu.ec.weier import DeviceCurve, get_device_curve

__all__ = ["DeviceCurve", "get_device_curve"]
