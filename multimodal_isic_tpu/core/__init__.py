from .config import Config, DirConfig, TrainingPlan, TrainParameters, load_config, config_from_dict  # noqa: F401
from .rng import RngPool, RngStream  # noqa: F401
from .early_stopping import EarlyStopping  # noqa: F401
from .train_state import TrainState, param_count  # noqa: F401
from . import metrics, optim, splits, checkpoint  # noqa: F401
