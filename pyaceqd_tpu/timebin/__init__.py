from pyaceqd_tpu.timebin.timebin import TimeBin
from pyaceqd_tpu.timebin.onephoton import OnePhotonCavity, OnePhotonTimebin
from pyaceqd_tpu.timebin.twophoton import TwoPhotonTimebin
from pyaceqd_tpu.timebin.twophoton_new import TwoPhotonTimebinNew
