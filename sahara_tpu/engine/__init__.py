from sahara_tpu.engine.device import DeviceIndex  # noqa: F401
