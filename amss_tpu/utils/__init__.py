"""Cross-cutting utilities: configs, run ids, metric logging."""

from amss_tpu.utils.config import (
    FrontConfig,
    SeparatorConfig,
    ModelConfig,
    TrainConfig,
    RecipeConfig,
    run_id,
)
