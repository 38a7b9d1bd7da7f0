from . import windows
from .dataset import MultiModalDataset, TSDataset, VideoDataset, VideoStore, filter_valid_shots
from .loader import ImbalancedSampler, epoch_batches, eval_batches, prefetch_to_device
from .splits import Scaler, deterministic_split, prepare_0d_dataset, random_split_shots, split_shots
from .synthetic import make_dataset, make_shot, save_dataset
