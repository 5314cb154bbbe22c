from pyaceqd_tpu.apps.rabi_rotations import RabiRotations
from pyaceqd_tpu.apps.tpe_rotations import TPERotations
