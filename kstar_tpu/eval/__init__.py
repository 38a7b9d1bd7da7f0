from .evaluate import (evaluate, evaluate_detail, evaluate_probs,
                       evaluation_figure, format_report)
from .feature_importance import (compute_permute_feature_importance,
                                 plot_feature_importance)
from .alarms import evaluate_video_alarms, threshold_sweep
