from pwstablenet_tpu.eval.metrics import (  # noqa: F401
    cropping_ratio_and_distortion,
    fidelity_report,
    psnr,
    ssim,
    stability_report,
    stability_score,
)
