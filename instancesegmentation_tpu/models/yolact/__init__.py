from instancesegmentation_tpu.models.yolact.model import FPN, ProtoNet, PredictionHead, Yolact

__all__ = ["FPN", "ProtoNet", "PredictionHead", "Yolact"]
