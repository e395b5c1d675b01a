"""Device/platform introspection (TPU analogue of ref utils.py:44-63)."""

from __future__ import annotations

import jax


def describe_devices(logger=None) -> dict:
    """Log and return a summary of the visible JAX devices.

    The reference's get_device() detects CUDA and enables cuDNN benchmarking
    (ref: utils.py:44-63); on TPU the analogous information is the platform,
    chip count, and memory — XLA autotuning needs no toggle.
    """
    devices = jax.devices()
    info = {
        "platform": devices[0].platform if devices else "none",
        "device_count": len(devices),
        "devices": [str(d) for d in devices],
        "default_backend": jax.default_backend(),
    }
    if logger is not None:
        logger.info(
            "JAX backend: %s | %d device(s): %s",
            info["default_backend"],
            info["device_count"],
            ", ".join(info["devices"]),
        )
    return info
