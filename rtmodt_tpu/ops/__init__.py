from rtmodt_tpu.ops.iou import box_iou, pairwise_iou  # noqa: F401
from rtmodt_tpu.ops.letterbox import letterbox, unletterbox_boxes  # noqa: F401
from rtmodt_tpu.ops.nms import batched_nms_fixed, NMSResult  # noqa: F401
from rtmodt_tpu.ops.polygon import points_in_polygons, pad_polygons  # noqa: F401
from rtmodt_tpu.ops.assignment import greedy_assign  # noqa: F401
