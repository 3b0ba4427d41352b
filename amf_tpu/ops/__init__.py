from amf_tpu.ops.linesearch import adaptive_descent, DescentInfo  # noqa: F401
from amf_tpu.ops.psd import project_psd  # noqa: F401
