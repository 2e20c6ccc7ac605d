from .schema import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    ModelConfig,
    OptimizerConfig,
    ScheduleConfig,
    TrainConfig,
)
from .presets import get_config, list_configs
from .mmseg_compat import model_config_from_mmseg
