"""Utility blocks (reference: utility/ module, SURVEY.md §2.9).

This file starts with /comms/signal_probe; the remaining scope utilities
(threshold, split/combine complex, wave_trigger) are siblings here.
"""

from __future__ import annotations

import time

import numpy as np

from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType
from pothoscomms_tpu.core.registry import register_block


@register_block("/comms/signal_probe", "/blocks/stream_probe")
class SignalProbe(Block):
    """VALUE/RMS/MEAN probe over the last <=window elements, wall-clock
    rate limited (reference: utility/SignalProbe.cpp:59-171).

    Probe type is double (complex<double> for complex streams); integer
    samples convert exactly (fromQ with zero shift, :141-157).
    """

    def __init__(self, dtype="float32"):
        super().__init__()
        self.dtype = DType.parse(dtype)
        self.setup_input(0, self.dtype)
        self._value = 0.0 + 0.0j if self.dtype.is_complex else 0.0
        self._mode = "VALUE"
        self._window = 1024
        self._rate = 0.0
        self._next_calc = 0.0
        self.register_probe("value")
        self.register_signal("valueChanged")
        self.input(0).set_reserve(1)

    def value(self):
        return self._value

    def set_mode(self, mode: str):
        self._mode = mode

    def get_mode(self) -> str:
        return self._mode

    def set_window(self, window: int):
        self._window = int(window)
        self.input(0).set_reserve(self._window)

    def get_window(self) -> int:
        return self._window

    def set_rate(self, rate: float):
        self._rate = float(rate)

    def get_rate(self) -> float:
        return self._rate

    def activate(self):
        self._next_calc = time.monotonic()

    def _to_probe(self, arr: np.ndarray) -> np.ndarray:
        if self.dtype.is_complex_int:
            return arr[..., 0].astype(np.float64) + 1j * arr[..., 1].astype(
                np.float64
            )
        if self.dtype.is_complex:
            return arr.astype(np.complex128)
        return arr.astype(np.float64)

    def work(self):
        port = self.input(0)
        n = min(self._window, port.elements())
        if n == 0:
            return
        buf = np.asarray(port.buffer(port.elements()))[:n]
        port.consume(n)

        now = time.monotonic()
        if self._rate != 0.0 and now < self._next_calc:
            return
        if self._rate != 0.0:
            self._next_calc += 1.0 / self._rate

        x = self._to_probe(buf)
        if self._mode == "VALUE":
            self._value = x[n - 1]
        elif self._mode == "RMS":
            self._value = float(np.sqrt(np.mean(np.abs(x) ** 2)))
        elif self._mode == "MEAN":
            self._value = x.mean()
        self.emit_signal("valueChanged", self._value)
