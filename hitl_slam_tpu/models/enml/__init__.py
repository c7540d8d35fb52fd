"""Episodic non-Markov Localization — the batch/online SLAM front end."""

from .driver import (  # noqa: F401
    EpisodeOptions,
    apply_noise_model,
    build_episodes,
    consistency_metric,
    localize_and_save,
)
from .localizer import EnmlOptions, batch_localize  # noqa: F401
from .online import OnlineLocalizer  # noqa: F401
