from gcc_tpu.models.encoder import GraphEncoder
from gcc_tpu.models.gin import UnsupervisedGIN

__all__ = ["GraphEncoder", "UnsupervisedGIN"]
