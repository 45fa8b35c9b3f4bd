"""Block catalog — importing this package registers every block factory.

Mirrors the reference's per-module plugin registration (SURVEY.md §2.12: the
57 registered `/comms/...` paths). Each submodule corresponds to a reference
module directory.
"""

import pothoscomms_tpu.core.fixtures  # noqa: F401  test fixture blocks

from pothoscomms_tpu.blocks import math  # noqa: F401
from pothoscomms_tpu.blocks import sources  # noqa: F401
from pothoscomms_tpu.blocks import fft  # noqa: F401
from pothoscomms_tpu.blocks import filter  # noqa: F401
from pothoscomms_tpu.blocks import window  # noqa: F401
from pothoscomms_tpu.blocks import utility  # noqa: F401
from pothoscomms_tpu.blocks import digital  # noqa: F401
from pothoscomms_tpu.blocks import framing  # noqa: F401
from pothoscomms_tpu.blocks import demod  # noqa: F401
from pothoscomms_tpu.blocks import mac  # noqa: F401
