"""Observability spectra: dB magnitude with NORMAL / AVERAGE / MAX_HOLD modes.

Parity: ``Calculate_FFT_Mag`` (``src/dsp/calculate_fft_mag.h:6-29``,
``calculate_fft_mag.cpp:11-45``) and ``InplaceFFTShift`` (``fftshift.h:7-32``).
The reference computes these lazily for GUI pulls; here they are an optional
tap-point transform (the XLA FFT replaces the FFTW3f plan cache at
``calculate_fft.cpp:28-59`` — no mutexes, no plans).
"""

from __future__ import annotations

import jax.numpy as jnp

MODE_NORMAL = "normal"
MODE_AVERAGE = "average"
MODE_MAX_HOLD = "max_hold"


def fft_mag_db(x: jnp.ndarray) -> jnp.ndarray:
    """20*log10(|fftshift(fft(x))|) along the last axis
    (``calculate_fft_mag.cpp:30-36``)."""
    spec = jnp.fft.fftshift(jnp.fft.fft(x, axis=-1), axes=-1)
    return 20.0 * jnp.log10(jnp.abs(spec) + 1e-20)


def fft_mag_update(
    prev: jnp.ndarray | None,
    x: jnp.ndarray,
    mode: str = MODE_AVERAGE,
    beta: float = 0.1,
) -> jnp.ndarray:
    """One spectrum update with carried display state (EMA beta=0.1 default,
    ``broadcast_fm_demod.cpp:20-24``)."""
    mag = fft_mag_db(x)
    if prev is None or mode == MODE_NORMAL:
        return mag
    if mode == MODE_AVERAGE:
        return prev + beta * (mag - prev)
    if mode == MODE_MAX_HOLD:
        return jnp.maximum(prev, mag)
    raise ValueError(f"unknown mode {mode}")


TRIGGER_ALWAYS = "always"
TRIGGER_SINGLE = "single"


class SpectrumView:
    """Stateful per-tap spectrum display, completing ``Calculate_FFT_Mag``
    parity (``calculate_fft_mag.h:6-29``): mode (NORMAL/AVERAGE/MAX_HOLD) +
    trigger (ALWAYS / SINGLE, the GUI's pull-one-then-hold behavior at
    ``calculate_fft_mag.h:25-28``) + the carried display buffer."""

    def __init__(self, mode: str = MODE_AVERAGE, trigger: str = TRIGGER_ALWAYS,
                 beta: float = 0.1):
        self.mode = mode
        self.trigger = trigger
        self.beta = beta
        self._buf = None
        self._armed = True  # SINGLE: armed until one update lands

    def arm(self) -> None:
        """Request one update in SINGLE-trigger mode (GUI button press)."""
        self._armed = True

    def update(self, x) -> None:
        """Offer a new block of the tapped signal; consumed per trigger."""
        if self.trigger == TRIGGER_SINGLE and not self._armed:
            return
        self._buf = fft_mag_update(self._buf, x, self.mode, self.beta)
        self._armed = self.trigger != TRIGGER_SINGLE

    @property
    def buffer(self):
        """Current display spectrum (``GetBuffer``), or None before first
        update."""
        return self._buf
