"""Default configuration.

Mirrors the subset of Detectron2's default config surface that WSOVOD's YAML
files touch, plus the WSOVOD extensions (reference
`wsovod/config/defaults.py:7-96`), so the reference configs load unchanged.
"""

from .config import CfgNode as CN


def get_cfg() -> CN:
    _C = CN()
    _C.VERSION = 2
    _C.OUTPUT_DIR = "./output"
    _C.SEED = -1
    _C.VIS_PERIOD = 0
    _C.VIS_TEST = False
    _C.CUDNN_BENCHMARK = False

    # ------------------------------------------------------------- MODEL
    _C.MODEL = CN()
    _C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN_WSOVOD"
    _C.MODEL.DEVICE = "tpu"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.MASK_ON = False
    _C.MODEL.KEYPOINT_ON = False
    _C.MODEL.LOAD_PROPOSALS = False
    # BGR means matching the reference caffe-style pixel stats
    _C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = "build_wsl_resnet_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 5

    _C.MODEL.RESNETS = CN()
    _C.MODEL.RESNETS.DEPTH = 18
    _C.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    _C.MODEL.RESNETS.NUM_GROUPS = 1
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES5_DILATION = 2
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    _C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]
    _C.MODEL.RESNETS.DEFORM_MODULATED = False
    _C.MODEL.RESNETS.DEFORM_NUM_GROUPS = 1

    _C.MODEL.VGG = CN()
    _C.MODEL.VGG.DEPTH = 16
    _C.MODEL.VGG.OUT_FEATURES = ["plain5"]
    _C.MODEL.VGG.CONV5_DILATION = 1

    _C.MODEL.SWIN = CN()
    _C.MODEL.SWIN.EMBED_DIM = 96
    _C.MODEL.SWIN.OUT_FEATURES = ["stage2", "stage3", "stage4", "stage5"]
    _C.MODEL.SWIN.DEPTHS = [2, 2, 6, 2]
    _C.MODEL.SWIN.NUM_HEADS = [3, 6, 12, 24]
    _C.MODEL.SWIN.WINDOW_SIZE = 7
    _C.MODEL.SWIN.MLP_RATIO = 4
    _C.MODEL.SWIN.DROP_PATH_RATE = 0.2
    _C.MODEL.SWIN.APE = False
    _C.MODEL.SWIN.PATH_NORM = True

    # d2 FPN keys consumed by build_swin_fpn_backbone (d2 defaults)
    _C.MODEL.FPN = CN()
    _C.MODEL.FPN.IN_FEATURES = ["stage2", "stage3", "stage4", "stage5"]
    _C.MODEL.FPN.OUT_CHANNELS = 256
    _C.MODEL.FPN.NORM = ""
    _C.MODEL.FPN.FUSE_TYPE = "sum"

    _C.MODEL.MRRP = CN()
    _C.MODEL.MRRP.MRRP_ON = False
    _C.MODEL.MRRP.NUM_BRANCH = 3
    _C.MODEL.MRRP.BRANCH_DILATIONS = [1, 2, 3]
    _C.MODEL.MRRP.MRRP_STAGE = "res4"
    _C.MODEL.MRRP.TEST_BRANCH_IDX = 1

    _C.MODEL.ANCHOR_GENERATOR = CN()
    _C.MODEL.ANCHOR_GENERATOR.NAME = "DefaultAnchorGenerator"
    _C.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    _C.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    _C.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
    _C.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    _C.MODEL.PROPOSAL_GENERATOR = CN()
    _C.MODEL.PROPOSAL_GENERATOR.NAME = "WSOVODRPN_V2"
    _C.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

    _C.MODEL.RPN = CN()
    _C.MODEL.RPN.HEAD_NAME = "StandardRPNHead"
    _C.MODEL.RPN.IN_FEATURES = ["res5"]
    _C.MODEL.RPN.BOUNDARY_THRESH = -1
    _C.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
    _C.MODEL.RPN.IOU_LABELS = [0, -1, 1]
    _C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    _C.MODEL.RPN.POSITIVE_FRACTION = 0.5
    _C.MODEL.RPN.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    _C.MODEL.RPN.SMOOTH_L1_BETA = 0.0
    _C.MODEL.RPN.LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 12000
    _C.MODEL.RPN.PRE_NMS_TOPK_TEST = 6000
    _C.MODEL.RPN.POST_NMS_TOPK_TRAIN = 2000
    _C.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    _C.MODEL.RPN.NMS_THRESH = 0.7
    _C.MODEL.RPN.CONV_DIMS = [-1]
    _C.MODEL.RPN.SCORE_THRESH_TRAIN = 0.2
    _C.MODEL.RPN.SCORE_THRESH_TEST = 0.2
    _C.MODEL.RPN.TOPK_CANDIDATES_TRAIN = 2000
    _C.MODEL.RPN.TOPK_CANDIDATES_TEST = 1000

    _C.MODEL.ROI_HEADS = CN()
    _C.MODEL.ROI_HEADS.NAME = "WSOVODROIHeads"
    _C.MODEL.ROI_HEADS.NUM_CLASSES = 80
    _C.MODEL.ROI_HEADS.IN_FEATURES = ["res5"]
    _C.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    _C.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    _C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    _C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    _C.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    _C.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    _C.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = True

    _C.MODEL.ROI_BOX_HEAD = CN()
    _C.MODEL.ROI_BOX_HEAD.NAME = "DiscriminativeAdaptationNeck"
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    _C.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
    _C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    _C.MODEL.ROI_BOX_HEAD.NUM_FC = 0
    _C.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    _C.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
    _C.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
    _C.MODEL.ROI_BOX_HEAD.NORM = ""
    _C.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
    _C.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = False
    _C.MODEL.ROI_BOX_HEAD.DAN_DIM = [4096, 4096]

    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY = CN()
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN = ""
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_PATH_TEST = ""
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 512
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.USE_BIAS = 0.0
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.NORM_WEIGHT = True
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.NORM_TEMP = 100.0
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE = False
    _C.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.PROTOTYPE_NUM = 5

    # ------------------------------------------------------------ WSOVOD
    _C.WSOVOD = CN()
    _C.WSOVOD.ITER_SIZE = 1
    _C.WSOVOD.CLS_AGNOSTIC_BBOX_KNOWN = False
    _C.WSOVOD.SAMPLING = CN()
    _C.WSOVOD.SAMPLING.SAMPLING_ON = False
    _C.WSOVOD.SAMPLING.IOU_THRESHOLDS = [[0.5], [0.5], [0.5], [0.5]]
    _C.WSOVOD.SAMPLING.IOU_LABELS = [[0, 1], [0, 1], [0, 1], [0, 1]]
    _C.WSOVOD.SAMPLING.BATCH_SIZE_PER_IMAGE = [4096, 4096, 4096, 4096]
    _C.WSOVOD.SAMPLING.POSITIVE_FRACTION = [1.0, 1.0, 1.0, 1.0]
    _C.WSOVOD.OBJECT_MINING = CN()
    _C.WSOVOD.OBJECT_MINING.WEIGHT = 1.0
    _C.WSOVOD.OBJECT_MINING.MEAN_LOSS = True
    _C.WSOVOD.INSTANCE_REFINEMENT = CN()
    _C.WSOVOD.INSTANCE_REFINEMENT.WEIGHT = 1.0
    _C.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 3
    _C.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [False, False, False]
    _C.WSOVOD.INSTANCE_REFINEMENT.REFINE_MIST = False
    _C.WSOVOD.INSTANCE_REFINEMENT.CROSS_ENTROPY_WEIGHTED = True
    _C.WSOVOD.BBOX_REFINE = CN()
    _C.WSOVOD.BBOX_REFINE.ENABLE = False
    _C.WSOVOD.BBOX_REFINE.MODEL_TYPE = "vit_b"
    _C.WSOVOD.BBOX_REFINE.MODEL_CHECKPOINT = "tools/sam_checkpoints/sam_vit_b_01ec64.pth"
    # cap on SAM box prompts per image per refine call (the mined-pgt table
    # is padded to num_classes*top_k rows but only present classes are
    # valid); 0 = no cap
    _C.WSOVOD.BBOX_REFINE.MAX_BOXES = 32

    # ------------------------------------------------------------- INPUT
    _C.INPUT = CN()
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.RANDOM_FLIP = "horizontal"
    _C.INPUT.CROP = CN()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "relative_range"
    _C.INPUT.CROP.SIZE = [0.9, 0.9]
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.MASK_FORMAT = "polygon"

    # ---------------------------------------------------------- DATASETS
    _C.DATASETS = CN()
    _C.DATASETS.TRAIN = ()
    _C.DATASETS.TEST = ()
    _C.DATASETS.PROPOSAL_FILES_TRAIN = ()
    _C.DATASETS.PROPOSAL_FILES_TEST = ()
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 2000
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 1000
    _C.DATASETS.MIXED_DATASETS = CN()
    _C.DATASETS.MIXED_DATASETS.NAMES = ["coco_2017_train"]
    _C.DATASETS.MIXED_DATASETS.WEIGHT_PATH_TRAINS = [
        "models/coco_text_embedding_single_prompt.pkl"
    ]
    _C.DATASETS.MIXED_DATASETS.NUM_CLASSES = [80]
    _C.DATASETS.MIXED_DATASETS.PROPOSAL_FILES = [""]
    _C.DATASETS.MIXED_DATASETS.RATIOS = [1]
    _C.DATASETS.MIXED_DATASETS.USE_CAS = [False]
    _C.DATASETS.MIXED_DATASETS.USE_RFS = [True]
    _C.DATASETS.MIXED_DATASETS.FILTER_EMPTY_ANNOTATIONS = [True]
    _C.DATASETS.MIXED_DATASETS.CAS_LAMBDA = 1.0
    _C.DATASETS.MIXED_DATASETS.REPEAT_THRESHOLD = 0.001

    # -------------------------------------------------------- DATALOADER
    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.ASPECT_RATIO_GROUPING = True
    _C.DATALOADER.CLASS_ASPECT_RATIO_GROUPING = False
    _C.DATALOADER.GROUP_WAIT = 5
    _C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    _C.DATALOADER.REPEAT_THRESHOLD = 0.0
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

    # ------------------------------------------------------------ SOLVER
    _C.SOLVER = CN()
    _C.SOLVER.OPTIMIZER = "SGD"
    _C.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    _C.SOLVER.MAX_ITER = 40000
    _C.SOLVER.BASE_LR = 0.001
    _C.SOLVER.BASE_LR_END = 0.1
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.NESTEROV = False
    _C.SOLVER.WEIGHT_DECAY = 0.0001
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.STEPS = (30000,)
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.CHECKPOINT_PERIOD = 5000
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.IMS_PER_BATCH_LIST = [4]
    _C.SOLVER.REFERENCE_WORLD_SIZE = 0
    _C.SOLVER.BIAS_LR_FACTOR = 1.0
    _C.SOLVER.WEIGHT_DECAY_BIAS = None
    _C.SOLVER.BACKBONE_MULTIPLIER = 1.0
    _C.SOLVER.CLIP_GRADIENTS = CN()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    _C.SOLVER.AMP = CN()
    _C.SOLVER.AMP.ENABLED = False

    # -------------------------------------------------------------- TEST
    _C.TEST = CN()
    _C.TEST.EXPECTED_RESULTS = []
    _C.TEST.EVAL_PERIOD = 0
    _C.TEST.EVAL_TRAIN = False
    # route post-NMS proposals into eval outputs for the proposal-recall
    # AR@{100,1000} diagnostic + box_proposals.pkl dump
    _C.TEST.EVAL_PROPOSALS = False
    _C.TEST.DETECTIONS_PER_IMAGE = 100
    _C.TEST.AUG = CN()
    _C.TEST.AUG.ENABLED = False
    _C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
    _C.TEST.AUG.MAX_SIZE = 4000
    _C.TEST.AUG.FLIP = True
    _C.TEST.PRECISE_BN = CN()
    _C.TEST.PRECISE_BN.ENABLED = False
    _C.TEST.PRECISE_BN.NUM_ITER = 200

    # ------------------------------------------------------- TPU-specific
    # Static-shape compilation controls (no d2 equivalent): padding buckets
    # for image sizes and proposal counts. Every jit-compiled shape is drawn
    # from these, bounding the number of XLA recompilations.
    _C.TPU = CN()
    _C.TPU.MESH_SHAPE = [-1]  # -1 = all devices on one data axis
    _C.TPU.MESH_AXES = ["data"]
    _C.TPU.IMAGE_SIZE_DIVISIBILITY = 32
    _C.TPU.IMAGE_BUCKETS = []  # [] = single bucket at MAX_SIZE padded square
    _C.TPU.PROPOSAL_PAD = 4096  # padded proposal count per image
    _C.TPU.MAX_GT_PAD = 128  # padded ground-truth instances per image
    _C.TPU.COMPUTE_DTYPE = "bfloat16"
    _C.TPU.PARAM_DTYPE = "float32"
    # dtype of the in-training SAM refine encoder (BBOX_REFINE): bf16 runs
    # the ViT ~4x faster on the MXU; its masks only seed pseudo-GT boxes, so
    # bf16 wiggle on mask edges is immaterial
    _C.TPU.SAM_COMPUTE_DTYPE = "bfloat16"
    # "fused" = image-batched resident-tile Pallas ROIAlign with the WSOVOD
    # objectness gate folded in, streamed chunk-wise into the DAN fc1 (~2.5x
    # the round-1 "pallas" kernel; exact; falls back to "pallas" on paths it
    # doesn't cover: MRRP, multi-level, off-TPU);
    # "pallas" = exact size-bucketed windowed-DMA Pallas ROIAlign (~2x faster
    # than gather on v5e, bit-accurate; auto-falls back to gather off-TPU);
    # "gather" = exact XLA-gather ROIAlign; "pallas_approx" = single-window
    # Pallas kernel (fastest, approximate for ROIs larger than the window)
    _C.TPU.ROI_ALIGN_KERNEL = "fused"
    # "int8": quantized DAN fc1 at inference (per-ROI activation scales,
    # per-column weight scales, int8 MXU matmul — 2x bf16 peak; with the
    # fused poolers the quantization is emitted by the pooling kernel
    # itself, no separate pass). Validated default: pre-NMS class probs
    # within 3% of the fp path and identical top detections
    # (tests/test_roi_pool_fused.py::test_int8_vs_fp_inference_detections);
    # set "none" for bit-parity runs against the fp pipeline.
    _C.TPU.DAN_FC1_QUANT = "int8"
    # unfused pool->DAN ROI chunk size (memory bound: the pooled tensor only
    # ever materializes per chunk; MRRP triples it and may need 256)
    _C.TPU.UNFUSED_ROI_CHUNK = 512
    # "int8": RPN head 3x3 conv as 9 shifted int8 GEMMs at inference (XLA's
    # int8 conv lowers at the bf16 rate on v5e; int8 dot_general hits ~1.9x).
    # Measured 38 -> 29 ms at the COCO bench shape, +0.6 img/s end-to-end;
    # proposal-set agreement guarded by
    # tests/test_misc_components.py::test_rpn_int8_conv_proposal_agreement.
    # Train always keeps the exact fp conv. Set "none" for bit-parity runs.
    _C.TPU.RPN_CONV_QUANT = "int8"
    # "int8": res4/res5 backbone convs (incl. the MAC-dominant bottleneck
    # 1x1s) as int8 GEMMs — the same shift decomposition as the RPN conv,
    # with dilation support for DC5/MRRP. MEASURED A NET LOSS on v5e
    # (2026-08-19, scripts/bench_backbone_int8.py: 62.6 ms vs 39.3 bf16 at
    # the B=8 688px bench shape) — unlike the single fat RPN conv, the
    # stage is ~30 thin convs and the per-conv activation quantize passes
    # (one full read+write of every intermediate) swamp the 2x MXU rate.
    # Kept selectable for other backends/shapes; default stays fp.
    _C.TPU.BACKBONE_CONV_QUANT = "none"

    return _C


def add_wsovod_config(cfg: CN) -> CN:
    """Kept for API parity with the reference (`wsovod/config/__init__.py`).

    Our `get_cfg` already includes every WSOVOD key, so this is a no-op
    returning the config unchanged.
    """
    return cfg
