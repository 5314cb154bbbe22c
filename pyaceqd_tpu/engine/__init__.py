from pyaceqd_tpu.engine.simulate import simulate
