"""Utility blocks (reference: utility/ module, SURVEY.md §2.9).

This file starts with /comms/signal_probe; the remaining scope utilities
(threshold, split/combine complex, wave_trigger) are siblings here.
"""

from __future__ import annotations

import time

import numpy as np

from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType
from pothoscomms_tpu.core.labels import Label
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


# ---------------------------------------------------------------------- #
# /comms/threshold (reference: utility/Threshold.cpp)
# ---------------------------------------------------------------------- #
@register_block("/comms/threshold", "/blocks/threshold")
class Threshold(Block):
    """Hysteresis comparator: posts activation/deactivation labels at
    crossing indices and forwards the stream (reference :117-149)."""

    def __init__(self, dtype="float32"):
        super().__init__()
        self.dtype = DType.parse(dtype)
        if self.dtype.is_complex or self.dtype.kind == "uint":
            raise ValueError("threshold supports real signed dtypes")
        self.setup_input(0, self.dtype)
        self.setup_output(0, self.dtype)
        self._activation_level = 0
        self._deactivation_level = 0
        self._activation_id = ""
        self._deactivation_id = ""
        self._active_state = False

    def set_activation_level(self, level):
        self._activation_level = level

    def get_activation_level(self):
        return self._activation_level

    def set_deactivation_level(self, level):
        self._deactivation_level = level

    def get_deactivation_level(self):
        return self._deactivation_level

    def set_activation_id(self, label_id: str):
        self._activation_id = label_id

    def get_activation_id(self) -> str:
        return self._activation_id

    def set_deactivation_id(self, label_id: str):
        self._deactivation_id = label_id

    def get_deactivation_id(self) -> str:
        return self._deactivation_id

    def activate(self):
        self._active_state = False

    def work(self):
        port = self.input(0)
        out = self.output(0)
        n = port.elements()
        if n == 0:
            return
        buf = np.asarray(port.buffer(n))
        # candidate crossing samples; state walk only visits those
        above = buf > self._activation_level
        below = buf < self._deactivation_level
        labels = []
        state = self._active_state
        for i in np.nonzero(above | below)[0]:
            if not state and above[i]:
                state = True
                if self._activation_id:
                    labels.append(Label(self._activation_id, None, int(i)))
            elif state and below[i]:
                state = False
                if self._deactivation_id:
                    labels.append(Label(self._deactivation_id, None, int(i)))
        self._active_state = bool(state)
        port.consume(n)
        out.post(buf.copy(), labels)


# ---------------------------------------------------------------------- #
# /comms/split_complex, /comms/combine_complex
# (reference: utility/SplitComplex.cpp, utility/CombineComplex.cpp)
# ---------------------------------------------------------------------- #
@register_block("/comms/split_complex")
class SplitComplex(Block):
    """complex -> named "re"/"im" output ports (reference :39-66)."""

    def __init__(self, dtype="float32"):
        super().__init__()
        scalar = DType.parse(dtype)
        if scalar.is_complex:
            scalar = scalar.scalar
        self.dtype = DType.parse("complex_" + scalar.name)
        self.scalar = scalar
        self.setup_input(0, self.dtype)
        self.setup_output("re", scalar)
        self.setup_output("im", scalar)

    def work(self):
        port = self.input(0)
        n = port.elements()
        if n == 0:
            return
        buf = np.asarray(port.buffer(n))
        if self.dtype.is_complex_int:
            re, im = buf[..., 0], buf[..., 1]
        else:
            re, im = buf.real, buf.imag
        port.consume(n)
        self.output("re").post(re.astype(self.scalar.np))
        self.output("im").post(im.astype(self.scalar.np))


@register_block("/comms/combine_complex")
class CombineComplex(Block):
    """named "re"+"im" input ports -> complex (reference
    CombineComplex.cpp)."""

    def __init__(self, dtype="float32"):
        super().__init__()
        scalar = DType.parse(dtype)
        if scalar.is_complex:
            scalar = scalar.scalar
        self.dtype = DType.parse("complex_" + scalar.name)
        self.scalar = scalar
        self.setup_input("re", scalar)
        self.setup_input("im", scalar)
        self.setup_output(0, self.dtype)

    def work(self):
        re_port, im_port = self.input("re"), self.input("im")
        n = min(re_port.elements(), im_port.elements())
        if n == 0:
            return
        re = np.asarray(re_port.buffer(n))
        im = np.asarray(im_port.buffer(n))
        if self.dtype.is_complex_int:
            out = np.stack([re, im], axis=-1)
        else:
            out = (re.astype(np.float64) + 1j * im.astype(np.float64)).astype(
                self.dtype.np
            )
        re_port.consume(n)
        im_port.consume(n)
        self.output(0).post(out)
