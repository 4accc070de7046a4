from pwstablenet_tpu.eval.metrics import (  # noqa: F401
    cropping_ratio_and_distortion,
    stability_report,
    stability_score,
)
