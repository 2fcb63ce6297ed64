from smap_tpu.evaluation.convert import results_to_predictions
from smap_tpu.evaluation.mupots import (FrameAnnotation, FramePrediction,
                                        MupotsMetrics, aggregate,
                                        cal_ordinal, compute_masked_pck_auc,
                                        compute_pck_auc, evaluate_sequence,
                                        map_to_gt_bone_lengths, match_people,
                                        reorder_to_test)
from smap_tpu.evaluation.mupots_data import (evaluate_results, load_mupots,
                                             load_sequence)
from smap_tpu.evaluation.panoptic import PanopticAccumulator
from smap_tpu.evaluation.register import register_pred

__all__ = ["results_to_predictions", "FrameAnnotation", "FramePrediction",
           "MupotsMetrics", "aggregate", "cal_ordinal",
           "compute_masked_pck_auc", "compute_pck_auc", "evaluate_sequence",
           "map_to_gt_bone_lengths", "match_people", "reorder_to_test",
           "evaluate_results", "load_mupots", "load_sequence",
           "PanopticAccumulator", "register_pred"]
