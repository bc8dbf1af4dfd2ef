from vap_realtime_tpu.models.vap import VapModel, init_vap_params  # noqa: F401
