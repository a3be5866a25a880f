"""User-facing error type (analogue of error_fmt,
/root/reference/src/sahara/utils/error_fmt.h:11-22)."""


class SaharaError(RuntimeError):
    pass
