from rsgnet_tpu.eval.coco_api import COCOAnnotations
from rsgnet_tpu.eval.cocoeval import KeypointEval

__all__ = ["COCOAnnotations", "KeypointEval"]
