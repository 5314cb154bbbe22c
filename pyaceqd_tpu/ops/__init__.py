from pyaceqd_tpu.ops.dsl import parse_operator, parse_operator_with_dims
