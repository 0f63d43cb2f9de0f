from mebt_tpu.sampler.mask_schedule import MaskGen, SCHEDULES  # noqa: F401
