from sahara_tpu.utils.stopwatch import StopWatch, Timings  # noqa: F401
from sahara_tpu.utils.errors import SaharaError  # noqa: F401
