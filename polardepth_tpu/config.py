"""Single structured config consumed by every entry point.

Replaces the reference's ~70-flag argparse namespace (reference:
manydepth/options.py:13-380) and the hardcoded attribute blocks in its eval
scripts (manydepth/evaluation.py:24-52, pointcloud/eval_pointcloud.py:32-85).
Field names follow the reference flags so users of the original can map their
shell scripts 1:1; defaults reproduce the published run
(train_supervised_GT.sh).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- paths --------------------------------------------------------------
    data_path: str = ""
    data_path_val: str = ""
    log_dir: str = "experiments"
    model_name: str = "polardepth"

    # ---- image geometry -----------------------------------------------------
    height: int = 320            # must be a multiple of 32
    width: int = 480
    scales: Sequence[int] = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 2.0

    # ---- dataset ------------------------------------------------------------
    dataset: str = "HAMMER"
    split: str = "HAMMER"
    eval_split: str = "HAMMER_unseen"
    frame_ids: Sequence[int] = (0, -1, 1)
    offset: int = 10             # temporal neighbour spacing in frames
    modality: str = "polarization"
    depth_modality: str = "_gt"  # folder suffix holding supervision depth
    overfit: bool = False
    overfit_scene: str = ""

    # ---- model graph selection (mirrors reference flag combinations) --------
    depth_supervision: bool = True
    depth_supervision_only: bool = True
    augment_xolp: bool = True
    augment_normals: bool = True
    train_student: bool = False      # ManyDepth cost-volume student path
    train_dpt: bool = False          # DPT/MiDaS backbone path
    # DPT variant (reference trainer.py:161-167 instantiates vitb_rn50_384):
    # "vitb_rn50" | "vitb16" | "vitl16"
    dpt_backbone: str = "vitb_rn50"
    # Converted timm/MiDaS .npz (offline scripts/convert_torch_dpt.py);
    # grafted into the DPT model via models/dpt_weights.load_dpt_npz when
    # weights_init="pretrained" and train_dpt.
    dpt_weights_path: str = ""
    pose_input: bool = False         # use GT poses instead of pose net
    supervise_pose: bool = False
    res_pose: bool = False           # residual-pose refinement pass
    use_attention: bool = False      # arch1++_attention variant
    # attention integration knobs (models/attention.py CrossModalAttention):
    # pe_in_stream=True is the legacy round-3 integration (PE leaks into the
    # fused features); gate=True gamma-gates the attention delta (init 0.1)
    attention_pe_in_stream: bool = False
    attention_gate: bool = True
    # 12-channel mode: the depth encoder consumes the four polarization
    # captures (each replicated to 3 channels, reference order
    # pol00/pol10/pol01/pol11) instead of the RGB frame
    # (reference indoor_dataset.py:85-86, 220-256, 322-333).
    enable_12channels: bool = False
    # Random horizontal flip of 50% of training samples, applied on device
    # inside the jitted train step.  The reference's MonoDataset (KITTI-style)
    # always flips in training (mono_dataset.py:152-160) while the HAMMER
    # IndoorDataset hardwires do_flip=False (indoor_dataset.py:302) — so the
    # default is False and the CLI turns it on for KITTI-family datasets.
    random_flip: bool = False
    num_layers: int = 18
    weights_init: str = "scratch"    # "pretrained" loads pretrained_weights_path
    # Converted torchvision ResNet18 ImageNet .npz (one-time offline dump via
    # scripts/convert_torch_resnet18.py); consumed when
    # weights_init="pretrained" by train/pretrained.py.
    pretrained_weights_path: str = ""
    dropout_rate: float = 0.1
    refraction_index: float = 1.5    # n for the Fresnel normal priors

    # ---- cost volume (student path) -----------------------------------------
    num_depth_bins: int = 96
    depth_binning: str = "linear"
    num_matching_frames: int = 1
    use_future_frame: bool = False
    # Matching augmentation is ON by default, as in the reference (its flag
    # is store_true default-False, options.py:278-281).
    no_matching_augmentation: bool = False
    disable_motion_masking: bool = False
    freeze_teacher_epoch: int = -1

    # ---- losses -------------------------------------------------------------
    normals_loss_weight: float = 0.35
    disparity_smoothness: float = 1e-3
    no_ssim: bool = False
    avg_reprojection: bool = False
    disable_automasking: bool = False
    v1_multiscale: bool = False
    # grid_sample strategy for the full-res reprojection warps:
    #   "auto"   — DEFAULT since round 5: "pallas_fast" on TPU (the fastest
    #              measured photometric sampler; single-pass bf16, ~1e-3
    #              relative — an order of magnitude below the photometric
    #              targets' own uint8 quantization), "patch" elsewhere.
    #              See ops/warp.py:resolve_warp_impl.
    #   "patch"  — one (2,2,C)-window lax.gather, ~1.65x the 4-corner flat
    #              gathers inside the loss graph on v5e (index-rate-bound);
    #   "flat4"  — the reference-shaped 4-gather form;
    #   "pallas" — the banded Pallas kernel (ops/pallas/band_warp.py):
    #              pipelined band DMA + MXU one-hot lerp, custom VJP.
    # patch/flat4 numerics are identical; pallas is exact within its K-row
    # vertical-parallax envelope (all tested).
    warp_impl: str = "auto"
    # Packed photometric losses: evaluate the full self-sup / student
    # reprojection pyramid as ONE stacked channels-leading computation
    # (ops/losses.reprojection_loss_stacked) instead of per-(frame, scale)
    # NHWC calls.  Removes the TPU lane-padding tax on the (B,H,W,3)/
    # (B,H,W,1) photometric tensors (the dominant loss-elementwise bucket in
    # profile_student_r3_trace.json).  Same math (tested); only applies when
    # not v1_multiscale (per-scale resolutions can't stack).
    photometric_packed: bool = False
    # Storage dtype for the photometric tensors (warped predictions + color
    # pyramids) feeding the reprojection losses: "auto" follows
    # compute_dtype (bf16 maps quantize at ~4e-3 — the same scale as the
    # images' own uint8/255 quantization — and halve the loss graph's
    # autodiff-residual HBM traffic), "float32"/"bfloat16" pin it.  The
    # loss ARITHMETIC is always float32 (ops/losses.py upcasts internally;
    # SSIM variances would cancel catastrophically in bf16).
    photometric_dtype: str = "auto"
    # plane-sweep (cost volume) sampler: "auto" (DEFAULT since round 5:
    # "pallas8_fast" on TPU, "xla" elsewhere — resolve_warp_impl), "xla" =
    # 4-corner gather (reference numerics), "pallas"/"pallas<K>"/"..._fast"
    # = banded Pallas warp — identical on every unmasked pixel (the sweep's
    # 2 px interior mask covers the padding-mode difference; tested).
    # Sweep is stop_gradient'ed, so this is forward-only.
    cv_warp_impl: str = "auto"

    # ---- optimization -------------------------------------------------------
    batch_size: int = 12
    learning_rate: float = 1e-4
    num_epochs: int = 50
    scheduler_step_size: int = 15    # StepLR: lr *= 0.1 every N epochs
    scheduler_gamma: float = 0.1

    # ---- logging / checkpointing --------------------------------------------
    log_frequency: int = 250
    save_frequency: int = 1
    checkpoint_dir: str = ""

    # ---- evaluation ---------------------------------------------------------
    # Flip-averaged eval post-processing (the original Monodepth paper's
    # trick, reference options.py --post_process): predict on the input and
    # its horizontal mirror, blend the two scaled disparities with the
    # Monodepth2 5%-border ramp masks.  Applies to eval/infer steps only.
    post_process: bool = False

    # ---- TPU execution ------------------------------------------------------
    # compute_dtype stays float32 by DEFAULT for bit-level parity with the
    # reference's f32 graphs; the measured production/headline configuration
    # is bfloat16 (bench.py, PERF.md).  bf16-vs-f32 accuracy deltas are
    # bounded by the ablation suite's parity check (tests/test_bf16_parity).
    compute_dtype: str = "float32"   # "bfloat16" for the fast path
    # (-1,): all devices data-parallel; (d, s): 2-D ('data', 'spatial') mesh
    # that additionally splits image H over s-way spatial partitions.
    mesh_shape: Sequence[int] = (-1,)
    # Fused Pallas preprocessing kernel (pol -> XOLP -> Fresnel priors in
    # one VMEM-resident pass).  ON by default since the round-4 banded/
    # planar rewrite: 4.06 ms vs 6.93 ms for the XLA chain at 8x512x512
    # (bench_physics_r4.json) and +12.6% on the 512 px headline
    # (277.6 -> 312.6 fps).  The round-1-3 caveat (nondeterministic Mosaic
    # compile hangs on the axon tunnel) applied to the old (512, 4)-tile
    # kernel; the planar (ROWS, 128) kernel compiles in seconds.  Only
    # consulted on TPU backends; CPU/interpret paths use the XLA chain.
    use_pallas: bool = True
    # Decoder fast mode: fold padding into the decoder convs instead of
    # materialising reflection-padded tensors (measured 19.5 -> 15.8 ms at
    # 8x512x512 bf16; PERF.md item 4).  Deviates from the reference's
    # reflection padding only in a border ring; checkpoints are
    # layout-compatible across both settings.
    fast_decoder: bool = False
    # Phase-packed decoder: execute the decoder's full-resolution 16/32-
    # channel stages space-to-depth packed (ops/phase.py) so every
    # materialized tensor keeps >=64 channels — removes the TPU lane-padding
    # HBM tax the round-3 roofline flagged (decoder 2.55x above its floor).
    # Mathematically identical to the reference graph (same parameters,
    # border-exact; tests/test_phase_decoder.py); differs from the unpacked
    # plan only by f32 reduction order.  ON by default since round 5: this
    # is the configuration the headline number measures (decoder AT its
    # roofline floor), and checkpoints are layout-compatible either way.
    # `--no_phase_packed_decoder` restores the unpacked execution plan.
    phase_packed_decoder: bool = True
    # Fused modality encoders: run the XOLP + normals ShallowEncoders as a
    # single conv stack at 128 channels (a full v5e lane tile) instead of
    # two independent 64-channel graphs.  Exactly the same math — groups
    # never mix and BN/ReLU/pool are per-channel
    # (models/pre_encoders.py:FusedModalityEncoders, parity-tested);
    # requires augment_xolp AND augment_normals (auto-disabled otherwise —
    # trainer.build_model).  ON by default since round 5 with the "dense"
    # plan: measured infer_512_bf16_phase 313.9 -> 335.6 fps (+6.9%,
    # bench_suite.json).  Separate-encoder checkpoints convert losslessly
    # via models/pre_encoders.py:fuse_modality_params; to LOAD one without
    # converting, pass --no_fused_encoders.
    fused_encoders: bool = True
    # Execution plan for the fused stack: "grouped" (feature_group_count=2,
    # round-4 — measured -19% on infer: XLA's TPU grouped-conv lowering) or
    # "dense" (block-diagonal dense convs, same params/math, full-lane
    # contraction — layers.py:_DenseExpandConv; wins the lowering microbench
    # 8.64 ms vs sep 10.6 / grouped 12.0, bench_fusion.json, AND the real
    # graph: +6.9% infer).
    fused_plan: str = "dense"
    # Rematerialisation in the teacher-student (cost-volume) train step.
    # True re-computes the teacher/encoder/decoder activations in the
    # backward pass (lower peak HBM); False keeps them resident and is the
    # measured-fastest configuration (bench_suite student rows).  The
    # default is set from scripts/check_student_memory.py's AOT memory
    # analysis of the published 320x480 batch-12 geometry — see
    # student_memory.json for the peak-HBM numbers behind it.
    student_remat: bool = False
    donate_state: bool = True
    # Host PNG decode backend: "cv2" (python) or "native" (the C++ libpng
    # thread-pool decoder, polardepth_tpu.runtime — GIL-free batch decode).
    # "auto" uses native when its shared library builds, else cv2.
    decode_backend: str = "auto"
    # Decoded-sample host RAM cache (GB; 0 disables).  Samples are raw
    # uint8/uint16 and all augmentation is device-side, so per-index loads
    # are deterministic and caching is exact; epochs 2+ skip PNG decode —
    # the training bottleneck on low-core hosts (PERF.md round 2).
    host_cache_gb: float = 8.0
    seed: int = 42

    @property
    def num_scales(self) -> int:
        return len(self.scales)

    @property
    def matching_ids(self) -> tuple:
        """Cost-volume lookup frame ids (reference trainer.py:131-135):
        [0] + ([1] if use_future_frame) + [-1 .. -num_matching_frames]."""
        ids = [0]
        if self.use_future_frame:
            ids.append(1)
        ids += list(range(-1, -1 - self.num_matching_frames, -1))
        return tuple(ids)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["scales"] = list(self.scales)
        d["frame_ids"] = list(self.frame_ids)
        d["mesh_shape"] = list(self.mesh_shape)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        for k in ("scales", "frame_ids", "mesh_shape"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)

    def validate(self) -> None:
        if self.height % 32 or self.width % 32:
            raise ValueError("height and width must be multiples of 32 "
                             f"(got {self.height}x{self.width})")
        if self.depth_supervision_only and not self.depth_supervision:
            raise ValueError("depth_supervision_only requires depth_supervision")
        if self.weights_init not in ("scratch", "pretrained"):
            raise ValueError(f"weights_init must be 'scratch' or 'pretrained'"
                             f" (got {self.weights_init!r})")
        if self.dpt_backbone not in ("vitb_rn50", "vitb16", "vitl16"):
            raise ValueError(f"unknown dpt_backbone {self.dpt_backbone!r}")
        if self.train_student:
            missing = [f for f in self.matching_ids
                       if f not in tuple(self.frame_ids)]
            if missing:
                raise ValueError(
                    f"matching frame ids {missing} (num_matching_frames="
                    f"{self.num_matching_frames}, use_future_frame="
                    f"{self.use_future_frame}) not in frame_ids "
                    f"{tuple(self.frame_ids)}")


# The published configuration (reference: train_supervised_GT.sh).
PUBLISHED = Config()

# Ablation graph configs from the final presentation (BASELINE.md).
RGB_ONLY = Config(augment_xolp=False, augment_normals=False,
                  model_name="ABLATIONS_rgb")
RGB_XOLP = Config(augment_normals=False, model_name="ABLATIONS_rgb_xolp")
RGB_NORMALS = Config(augment_xolp=False, model_name="ABLATIONS_rgb_normals")
TRI_ENCODER = Config(model_name="ABLATIONS_rgb_xolp_normals")
