from .pipeline import (  # noqa: F401
    DEFAULT_THRESHOLD,
    FEATURES_CATEGORICAL,
    FEATURES_NUMERIC,
    LABEL,
    build_pipeline,
    default_metadata,
    evaluate,
    load_model,
    save_model,
    score,
    train,
)
