"""pyaceqd_tpu: TPU-native open-quantum-systems framework (PT-MPO engine,
multi-time correlations, time-bin/polarization entanglement) with the same
capability surface as the reference pyaceqd + ACE stack."""

from pyaceqd_tpu import config as _config  # enables the persistent compile cache
from pyaceqd_tpu.utils.diagnostics import last_pt_info, format_pt_info

__all__ = ["last_pt_info", "format_pt_info"]
