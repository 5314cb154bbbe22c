"""Physical constants and global configuration knobs.

Mirrors the reference's ``pyaceqd/constants.py`` (hbar in meV*ps), but drops the
machine-specific ``pybind_path``/``temp_dir``: this framework is in-process and
file-free on the hot path.  ``temp_dir`` is kept (default: system temp) only for
optional artifact export (pulse CSVs, cached process tensors).
"""

import os
import tempfile

hbar = 0.6582119569  # meV*ps  (reference: pyaceqd/constants.py:1)

# Directory for cached process tensors and optional file exports.
temp_dir = os.environ.get("PYACEQD_TPU_TEMP", tempfile.gettempdir()) + os.sep

# Speed of light, used by unit conversions (nm <-> meV)
c_light_nm_ps = 299792.458  # nm/ps
