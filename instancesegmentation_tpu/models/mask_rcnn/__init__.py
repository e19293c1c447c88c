from instancesegmentation_tpu.models.mask_rcnn.model import MaskRCNN

__all__ = ["MaskRCNN"]
