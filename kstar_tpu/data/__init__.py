from . import windows
from .dataset import MultiModalDataset, TSDataset, VideoDataset, VideoStore, filter_valid_shots
from .loader import ImbalancedSampler, epoch_batches, eval_batches, prefetch_to_device
from .splits import Scaler, deterministic_split, prepare_0d_dataset, random_split_shots, split_shots
from .synthetic import make_dataset, make_shot, save_dataset
from .augment import center_crop, make_pre_fns, preprocess_batch, preprocess_pure
from .device_pipe import DevicePreprocessor
from .profiles import get_profile, profile_tensor
from .shotlog import detect_cutoff, detect_startup, extend_shot_log
from .ts_pipeline import build_0d_table, sync_video_0d
