from pyaceqd_tpu.correlations.correlations import (
    two_op_one_time, three_op_one_time, two_op_two_time, three_op_two_time,
    five_op_two_time, get_spectrum, tl_two_op_two_time, tl_three_op_two_time)
from pyaceqd_tpu.correlations.phonon_tl import (
    tl_three_op_two_time_phonons, tl_threeoptwotime_phonons_dm)
