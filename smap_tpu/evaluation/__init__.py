from smap_tpu.evaluation.convert import results_to_predictions
from smap_tpu.evaluation.mupots import (FrameAnnotation, FramePrediction,
                                        MupotsMetrics, aggregate,
                                        cal_ordinal, compute_pck_auc,
                                        evaluate_sequence,
                                        map_to_gt_bone_lengths, match_people,
                                        reorder_to_test)

__all__ = ["results_to_predictions", "FrameAnnotation", "FramePrediction",
           "MupotsMetrics", "aggregate", "cal_ordinal", "compute_pck_auc",
           "evaluate_sequence", "map_to_gt_bone_lengths", "match_people",
           "reorder_to_test"]
