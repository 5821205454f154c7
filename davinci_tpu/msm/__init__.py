from davinci_tpu.msm.pippenger import msm, msm_host_input, msm_many, sharded_msm

__all__ = ["msm", "msm_host_input", "msm_many", "sharded_msm"]
