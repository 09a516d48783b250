"""Default configuration.

Mirrors the reference's config surface so its YAML overlays apply 1:1:
  - the maskrcnn-benchmark base keys SiamMOT consumes (INPUT / MODEL.RPN /
    MODEL.ROI_HEADS / MODEL.ROI_BOX_HEAD / MODEL.FPN / SOLVER / DATALOADER /
    DATASETS / TEST), and
  - the SiamMOT extensions from ``/root/reference/siammot/configs/defaults.py:1-109``
    (MODEL.DLA.*, MODEL.TRACK_HEAD.* incl. EMM.*/IMM.*, VIDEO.*, INFERENCE.*,
    INPUT video-aug keys, DATASETS.ROOT_DIR).

A TPU-only namespace ``cfg.TPU`` holds the static-shape capacities that the
fixed-shape JAX design needs (padded track slots, detection caps, dtypes);
these have no reference counterpart because the reference uses dynamic
shapes throughout.
"""

from .node import CfgNode as CN

_C = CN()

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------
_C.MODEL = CN()
_C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
_C.MODEL.WEIGHT = ""
_C.MODEL.BOX_ON = True
_C.MODEL.TRACK_ON = True
_C.MODEL.RPN_ONLY = False
_C.MODEL.CLS_AGNOSTIC_BBOX_REG = False
_C.MODEL.DEVICE = "tpu"

_C.MODEL.BACKBONE = CN()
_C.MODEL.BACKBONE.CONV_BODY = "DLA-34-FPN"
_C.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0

_C.MODEL.FPN = CN()
_C.MODEL.FPN.USE_GN = False
_C.MODEL.FPN.USE_RELU = False

# DLA (reference defaults.py:31-38)
_C.MODEL.DLA = CN()
_C.MODEL.DLA.DLA_STAGE2_OUT_CHANNELS = 64
_C.MODEL.DLA.DLA_STAGE3_OUT_CHANNELS = 128
_C.MODEL.DLA.DLA_STAGE4_OUT_CHANNELS = 256
_C.MODEL.DLA.DLA_STAGE5_OUT_CHANNELS = 512
_C.MODEL.DLA.BACKBONE_OUT_CHANNELS = 128
_C.MODEL.DLA.STAGE_WITH_DCN = (False, False, False, False, False, False)

# ResNet bodies (maskrcnn-benchmark MODEL.RESNETS defaults; the reference
# model zoo's R-50/R-101 Faster-RCNN detector inits use these via
# maskrcnn's resnet.py — Caffe2 conventions incl. STRIDE_IN_1X1)
_C.MODEL.RESNETS = CN()
_C.MODEL.RESNETS.NUM_GROUPS = 1
_C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
_C.MODEL.RESNETS.STRIDE_IN_1X1 = True
_C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
_C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
_C.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
_C.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, False, False)

# RPN (reference defaults.py:9-15 + maskrcnn base)
_C.MODEL.RPN = CN()
_C.MODEL.RPN.USE_FPN = True
_C.MODEL.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
_C.MODEL.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
_C.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
_C.MODEL.RPN.STRADDLE_THRESH = 0
_C.MODEL.RPN.FG_IOU_THRESHOLD = 0.7
_C.MODEL.RPN.BG_IOU_THRESHOLD = 0.3
_C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
_C.MODEL.RPN.POSITIVE_FRACTION = 0.5
_C.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 2000
_C.MODEL.RPN.PRE_NMS_TOP_N_TEST = 1000
_C.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 2000
_C.MODEL.RPN.POST_NMS_TOP_N_TEST = 300
_C.MODEL.RPN.NMS_THRESH = 0.7
_C.MODEL.RPN.MIN_SIZE = 0
_C.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 2000
_C.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 300
_C.MODEL.RPN.FPN_POST_NMS_PER_BATCH = True

# ROI heads (shared)
_C.MODEL.ROI_HEADS = CN()
_C.MODEL.ROI_HEADS.USE_FPN = True
_C.MODEL.ROI_HEADS.FG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
_C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 256
_C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
_C.MODEL.ROI_HEADS.SCORE_THRESH = 0.05
_C.MODEL.ROI_HEADS.NMS = 0.5
_C.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 100

# Box head (reference defaults.py:20-27)
_C.MODEL.ROI_BOX_HEAD = CN()
_C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
_C.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
_C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
_C.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "FPN2MLPFeatureExtractor"
_C.MODEL.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
_C.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 2
_C.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 1024

# Track head (reference defaults.py:40-84)
_C.MODEL.TRACK_HEAD = CN()
_C.MODEL.TRACK_HEAD.TRACKTOR = False
_C.MODEL.TRACK_HEAD.POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
_C.MODEL.TRACK_HEAD.POOLER_RESOLUTION = 15
_C.MODEL.TRACK_HEAD.POOLER_SAMPLING_RATIO = 2
_C.MODEL.TRACK_HEAD.PAD_PIXELS = 512
_C.MODEL.TRACK_HEAD.SEARCH_REGION = 2.0
_C.MODEL.TRACK_HEAD.MINIMUM_SREACH_REGION = 0
_C.MODEL.TRACK_HEAD.MODEL = "EMM"
_C.MODEL.TRACK_HEAD.TRACK_THRESH = 0.4
_C.MODEL.TRACK_HEAD.START_TRACK_THRESH = 0.6
_C.MODEL.TRACK_HEAD.RESUME_TRACK_THRESH = 0.4
_C.MODEL.TRACK_HEAD.MAX_DORMANT_FRAMES = 1
_C.MODEL.TRACK_HEAD.PROPOSAL_PER_IMAGE = 256
_C.MODEL.TRACK_HEAD.FG_IOU_THRESHOLD = 0.65
_C.MODEL.TRACK_HEAD.BG_IOU_THRESHOLD = 0.35

_C.MODEL.TRACK_HEAD.IMM = CN()
_C.MODEL.TRACK_HEAD.IMM.FC_HEAD_DIM_MULTIPLIER = 2
_C.MODEL.TRACK_HEAD.IMM.FC_HEAD_DIM = 256

_C.MODEL.TRACK_HEAD.EMM = CN()
_C.MODEL.TRACK_HEAD.EMM.USE_CENTERNESS = True
_C.MODEL.TRACK_HEAD.EMM.POS_RATIO = 0.25
_C.MODEL.TRACK_HEAD.EMM.HN_RATIO = 0.25
_C.MODEL.TRACK_HEAD.EMM.TRACK_LOSS_WEIGHT = 1.0
_C.MODEL.TRACK_HEAD.EMM.CLS_POS_REGION = 0.8
_C.MODEL.TRACK_HEAD.EMM.COSINE_WINDOW_WEIGHT = 0.4

# ---------------------------------------------------------------------------
# Input (maskrcnn base + reference defaults.py:101-105)
# ---------------------------------------------------------------------------
_C.INPUT = CN()
_C.INPUT.MIN_SIZE_TRAIN = (800,)
_C.INPUT.MAX_SIZE_TRAIN = 1333
_C.INPUT.MIN_SIZE_TEST = 800
_C.INPUT.MAX_SIZE_TEST = 1333
_C.INPUT.PIXEL_MEAN = (0.485, 0.456, 0.406)
_C.INPUT.PIXEL_STD = (0.229, 0.224, 0.225)
_C.INPUT.TO_BGR255 = False
_C.INPUT.BRIGHTNESS = 0.0
_C.INPUT.CONTRAST = 0.0
_C.INPUT.SATURATION = 0.0
_C.INPUT.HUE = 0.0
_C.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.5
_C.INPUT.MOTION_LIMIT = 0.1
_C.INPUT.COMPRESSION_LIMIT = 50
_C.INPUT.MOTION_BLUR_PROB = 0.5
_C.INPUT.AMODAL = False

# ---------------------------------------------------------------------------
# Video / inference (reference defaults.py:86-97)
# ---------------------------------------------------------------------------
_C.VIDEO = CN()
_C.VIDEO.TEMPORAL_WINDOW = 8
_C.VIDEO.TEMPORAL_SAMPLING = 4
_C.VIDEO.RANDOM_FRAMES_PER_CLIP = 2

_C.INFERENCE = CN()
_C.INFERENCE.USE_GIVEN_DETECTIONS = False
_C.INFERENCE.CLIP_LEN = 1

# ---------------------------------------------------------------------------
# Solver / data
# ---------------------------------------------------------------------------
_C.SOLVER = CN()
_C.SOLVER.BASE_LR = 0.02
_C.SOLVER.BIAS_LR_FACTOR = 2
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 0.0001
_C.SOLVER.WEIGHT_DECAY_BIAS = 0
_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30000, 40000)
_C.SOLVER.MAX_ITER = 50000
_C.SOLVER.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER.WARMUP_ITERS = 500
_C.SOLVER.WARMUP_METHOD = "linear"
_C.SOLVER.CHECKPOINT_PERIOD = 5000
_C.SOLVER.VIDEO_CLIPS_PER_BATCH = 16
# TPU addition: run each global batch as N sequential microbatches with
# averaged gradients (one optimizer/LR step per batch) — the reference's
# 8-GPU batch-16 recipe on fewer chips without 8x activation memory
_C.SOLVER.ACCUMULATION_STEPS = 1

_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 4
_C.DATALOADER.SIZE_DIVISIBILITY = 32
_C.DATALOADER.ASPECT_RATIO_GROUPING = False

_C.DATASETS = CN()
_C.DATASETS.TRAIN = ()
_C.DATASETS.TEST = ()
_C.DATASETS.ROOT_DIR = ""

_C.TEST = CN()
_C.TEST.BBOX_AUG = CN()
_C.TEST.BBOX_AUG.ENABLED = False

_C.DTYPE = "float32"
_C.OUTPUT_DIR = "."

# ---------------------------------------------------------------------------
# TPU-only static-shape / execution knobs (no reference counterpart)
# ---------------------------------------------------------------------------
_C.TPU = CN()
# padded track-slot capacity (active + dormant tracks per stream)
_C.TPU.MAX_TRACKS = 128
# padded detection capacity out of the box head per frame
_C.TPU.MAX_DETECTIONS = 256
# padded ground-truth capacity per frame in the train collator
_C.TPU.MAX_GT = 100
# compute dtype for the conv trunk ("bfloat16" or "float32")
_C.TPU.COMPUTE_DTYPE = "bfloat16"
# image sizes are bucketed/padded to fixed shapes for compile caching
_C.TPU.INPUT_HEIGHT = 0   # 0 = derive from INPUT.MIN/MAX_SIZE_TEST
_C.TPU.INPUT_WIDTH = 0
# use Pallas kernels for hot ops (else pure-XLA fallbacks)
_C.TPU.USE_PALLAS = True
# windowed-separable ROIAlign at inference (ops/roi_align_windowed.py):
# per-site static window sizes, exact for sample spans that fit (the
# LevelMapper bounds extents to ~[14, 28) feature px per sqrt-area axis)
_C.TPU.POOLER_WINDOWED = True
# windowed/Pallas pooling in the TRAINING step too (the Pallas window
# pool has a sequential-scatter backward kernel; f32 table).  2.6x the
# train-step throughput of the exact gather pooler on-chip; set False
# for the no-window-coverage-caveat gather path (PARITY.md dev. 5/9),
# e.g. for SEARCH_REGION > 2 recipes whose SR spans exceed WINDOW_SR.
_C.TPU.TRAIN_POOLER_WINDOWED = True
# ship raw uint8 frames and normalize on device (4x less host->HBM
# traffic; exact — the augmentation pipeline is uint8 end-to-end and the
# pad is re-zeroed post-normalization).  False restores the reference's
# host-side Normalize transform.
_C.TPU.DEVICE_NORMALIZE = True
_C.TPU.WINDOW_BOX = 64
_C.TPU.WINDOW_TEMPLATE = 64
_C.TPU.WINDOW_SR = 128
# stacked-table dtype for the windowed pooler ("bfloat16" halves the
# per-ROI window DMA; pooled outputs are always f32-accumulated)
_C.TPU.POOLER_DTYPE = "bfloat16"
# space-to-depth DLA stem: exact rewrite of the 3 full-resolution
# low-channel stem convs into half-res 4x-channel convs (models/dla.py)
_C.TPU.S2D_STEM = True
# DLA stages whose 3x3 convs run as explicit im2col MXU matmuls
# (models/dla.py conv3x3_matmul) — the deep small-spatial stages tile the
# MXU poorly under XLA's native conv; set by on-chip A/B
_C.TPU.CONV_MATMUL_STAGES = ()
# --- on-chip (Mosaic) validated Pallas kernels --------------------------
# tools/verify_kernels_tpu.py passed on a real v5e chip (2026-08-18,
# post Mosaic-lowering fixes) and tests/test_pallas_lowering.py locks the
# Mosaic lowering via jax.export cross-lowering on CPU.  Full-step A/B at
# 720p, same session: off/off 90.5 FPS, decode-only 94.7, masked-only
# 99.2, both 108.8 (empty tracker; the masked win shrinks as live-track
# occupancy grows — that is the kernels' occupancy-proportional design).
# Pallas fused decode (upsample+penalty+argmax in VMEM; whole-map and
# row-striped variants) instead of the XLA fused decode epilogue
_C.TPU.DECODE_PALLAS = True
# dead-slot-skipping masked kernels for the per-track pipeline (xcorr,
# predictor, decode) — compute scales with occupancy, not capacity
_C.TPU.MASKED_TRACK_KERNELS = True
# device mesh axis sizes for data parallelism (0 = all available devices)
_C.TPU.DATA_PARALLEL = 0
# rematerialize backbone activations in the training backward pass
# (jax.checkpoint): trades ~25% step FLOPs for the dominant share of
# activation memory — enables bigger per-chip batches
_C.TPU.REMAT = False


def get_cfg() -> CN:
    """Return a fresh clone of the default config."""
    return _C.clone()


cfg = _C
