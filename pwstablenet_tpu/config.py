"""Typed configuration for the whole framework.

Every hyperparameter of the reference (argparse flags in its train/test
scripts — SURVEY.md C20) becomes a named, typed field here so the
configuration surface is explicit and testable.  Defaults follow the
PWStableNet paper (arXiv:1905.08959) and pix2pix conventions where the
reference is not readable (SURVEY.md section 0 provenance caveat).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Cascaded generator + PatchGAN discriminator architecture.

    The generator consumes a temporal stack of ``temporal_window`` RGB
    frames (channels-concatenated, SURVEY.md C3) and emits one 2-channel
    per-pixel displacement field per cascade stage (SURVEY.md C6/C7).
    """

    # --- temporal context ---
    temporal_window: int = 7          # frames per stack (center + neighbors)
    in_channels: int = 3              # per-frame channels (RGB)
    # Position of the CURRENT frame inside the stack. None = centered
    # (temporal_window // 2, the reference's symmetric context).
    # temporal_window - 1 = fully CAUSAL: all context is past frames,
    # so streaming inference needs no future lookahead — the
    # zero-latency live mode (pipeline pads no tail halo; the
    # causality property is test-enforced).  Intermediate values trade
    # lookahead latency for future context.
    temporal_center: "int | None" = None

    # --- stage UNet (pix2pix-style, SURVEY.md C5) ---
    num_levels: int = 8               # stride-2 down/up levels; 256x256 -> 1x1
    base_features: int = 64
    max_features: int = 512
    norm: str = "instance"            # batch | instance | group | none
    leaky_slope: float = 0.2
    dropout_rate: float = 0.5         # on the 3 innermost decoder levels
    use_dropout: bool = False

    # --- cascade (SURVEY.md C6) ---
    num_stages: int = 2
    interstage: str = "both"          # features | warped | both

    # Decoder 2x-upsampler lowering. "deconv" = flax ConvTranspose
    # (reference behavior); "phase_conv" = the same operator computed
    # as one dense stride-1 2x2 conv + shifted-slice interleave
    # (models/blocks.py:PhaseConvTranspose2x — equal flops, identical
    # param tree, float-tolerance-identical outputs; exists to bypass
    # the input-dilation lowering's kernel-layout copies).
    decoder_impl: str = "deconv"      # deconv | phase_conv

    # --- warp-map head (SURVEY.md C7) ---
    # Output is a *displacement* field in normalized grid units
    # ([-1, 1] spans the frame; see ops/warp.py).  The final conv is
    # zero-initialized so training starts from the identity warp.
    flow_scale: float = 1.0
    # Model always runs at this fixed resolution; warp fields are
    # bilinearly upsampled to the frame resolution before application
    # (keeps the conv ladder statically shaped and MXU-friendly).
    model_resolution: Tuple[int, int] = (256, 256)  # (H, W)

    # --- grid-sample semantics (locked by torch parity tests) ---
    align_corners: bool = True
    padding_mode: str = "border"      # zeros | border | reflection

    # --- PatchGAN discriminator (SURVEY.md C9) ---
    disc_base_features: int = 64
    disc_num_layers: int = 3          # 70x70 receptive field
    disc_norm: str = "instance"

    # --- perceptual feature extractor (SURVEY.md C12) ---
    feat_channels: Tuple[int, ...] = (32, 64, 128)

    # --- numerics ---
    compute_dtype: str = "bfloat16"   # activations inside the network
    param_dtype: str = "float32"

    def __post_init__(self):
        if self.temporal_window % 2 == 0 or self.temporal_window < 1:
            raise ValueError(
                f"temporal_window must be odd and >= 1, got "
                f"{self.temporal_window} (center frame + symmetric "
                "neighbors)"
            )
        if self.temporal_center is not None and not (
            0 <= self.temporal_center < self.temporal_window
        ):
            raise ValueError(
                f"temporal_center must be in [0, {self.temporal_window}) "
                f"or None, got {self.temporal_center}"
            )
        if self.decoder_impl not in ("deconv", "phase_conv"):
            raise ValueError(
                f"unknown decoder_impl {self.decoder_impl!r} "
                "(deconv | phase_conv)"
            )
        h, w = self.model_resolution
        if h % (2**self.num_levels) or w % (2**self.num_levels):
            raise ValueError(
                f"model_resolution {self.model_resolution} must be "
                f"divisible by 2^num_levels ({2**self.num_levels})"
            )

    @property
    def stack_channels(self) -> int:
        return self.temporal_window * self.in_channels

    @property
    def center_index(self) -> int:
        """Index of the current frame in the temporal stack."""
        if self.temporal_center is None:
            return self.temporal_window // 2
        return self.temporal_center

    @property
    def future_frames(self) -> int:
        """Lookahead frames needed per output frame (0 = causal)."""
        return self.temporal_window - 1 - self.center_index


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Adversarial training (SURVEY.md C10-C17)."""

    batch_size: int = 8               # global (sharded over the mesh)
    num_epochs: int = 40
    steps_per_epoch: int = 1000

    # Adam, pix2pix-style (SURVEY.md C16)
    lr_g: float = 2e-4
    lr_d: float = 2e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    # linear decay to 0 over the second half of training
    lr_decay_start_frac: float = 0.5

    # loss weights (SURVEY.md C10-C15); adversarial weight is 1.
    w_pixel: float = 100.0
    # NB: with the offline default (random-frozen extractor, no VGG
    # import) the feature term measured a three-way tie against
    # w_feature=0 at the CPU-envelope scale (README round-5 ablation);
    # kept non-zero for reference parity with an imported VGG.
    w_feature: float = 10.0
    w_temporal: float = 10.0
    w_warp_reg: float = 1.0
    # per-stage supervision weights, later stages higher (SURVEY.md C15)
    stage_weights: Tuple[float, ...] = (0.5, 1.0)

    gan_loss: str = "lsgan"           # lsgan | vanilla | hinge

    # pixel-term form (C11): "l1" is the reference loss; "mean_matched"
    # divides out a per-sample/channel brightness gain before the L1
    # (robust to auto-exposure steps, which otherwise read as geometric
    # error — see losses.pixel_loss_photometric); "gradient" compares
    # spatial finite differences (exact additive-offset invariance).
    pixel_loss_mode: str = "l1"

    # temporal-consistency form (C13): "raw" penalizes |out_t - out_{t+1}|
    # directly (reference behavior; fights legitimate pans);
    # "compensated" penalizes |Δout - Δgt| — the GT stable-to-stable
    # motion cancels, so pans are free and only residual jitter is
    # suppressed (train/losses.temporal_loss_compensated)
    temporal_mode: str = "compensated"

    # micro-batch gradient accumulation: grads average over
    # batch_size/grad_accum_steps-sized micro-batches before ONE G and
    # ONE D update (large effective batches within one chip's HBM)
    grad_accum_steps: int = 1

    # exponential moving average of generator params (0 = off).  The
    # EMA weights ride in TrainState/checkpoints and typically give a
    # smoother generator for inference than the raw adversarial params
    # (standard GAN practice; not in the reference — additive).
    ema_decay: float = 0.0

    seed: int = 0
    log_every: int = 50
    # run the eval hook (train(eval_fn=...), eval/hooks.py) every N
    # steps; 0 = only at the end of training (when a hook is given)
    eval_every: int = 0
    # optional JSONL scalar log file in addition to stdout
    # (SURVEY.md section 5.5); "" = stdout only
    scalar_log_path: str = ""
    # optional TensorBoard event-file directory (SURVEY.md section 5.5;
    # dependency-free writer, utils/tb_writer.py); "" = disabled
    tb_log_dir: str = ""
    checkpoint_every: int = 1000
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    debug_nans: bool = False
    # debug flag: raise at this step to exercise resume (SURVEY.md section 5.3)
    fault_inject_step: int = -1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """DeepStab pairing + host-side pipeline (SURVEY.md C1-C4)."""

    data_root: str = "DeepStab"
    stable_dir: str = "stable"
    unstable_dir: str = "unstable"
    crop_size: Tuple[int, int] = (256, 256)
    random_flip: bool = True
    # shared random scale jitter applied before the crop (C4 "resize");
    # (1.0, 1.0) disables. Lower bound is clamped so the crop always fits.
    resize_scale_range: Tuple[float, float] = (1.0, 1.0)
    frame_stride: int = 1             # stride between temporal neighbors
    prefetch_depth: int = 2           # double-buffered device batches
    # decode worker threads per batch (deepstab.batch_iterator)
    num_decode_threads: int = 2
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for data-parallel training and clip-sharded inference
    (SURVEY.md section 2.3)."""

    data_axis: str = "data"
    num_devices: int = -1             # -1 = all local devices


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Video-in / video-out inference (SURVEY.md C19)."""

    batch_windows: int = 8            # temporal windows per device step
    border_crop_frac: float = 0.0     # optional stabilize-crop (0 = off)
    emit_warp_fields: bool = True
    # dtype warp fields cross device->host in; float16 halves the D2H
    # bytes of the flow stream (displacements are O(1e-1) normalized
    # units — fp16's ~3 decimal digits are plenty for export/analysis;
    # keep float32 when feeding flows back into computation)
    warp_field_dtype: str = "float32"
    output_codec: str = "mp4v"
    prefetch_depth: int = 2
