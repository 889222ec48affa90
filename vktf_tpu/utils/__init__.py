from vktf_tpu.utils.data_view import as_view, size_bytes
from vktf_tpu.utils.delta_time import DeltaTime
from vktf_tpu.utils.timing import FrameTimer

__all__ = ["as_view", "size_bytes", "DeltaTime", "FrameTimer"]
