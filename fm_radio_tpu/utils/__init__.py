"""Utilities: host<->device transfer shims, profiling, checkpointing."""

from fm_radio_tpu.utils.transfer import (  # noqa: F401
    device_put_complex,
    fetch,
    init_on_device,
)
