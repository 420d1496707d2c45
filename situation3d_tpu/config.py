"""Unified configuration tree.

Replaces the reference's three coexisting config systems — the module-global
``CONF`` EasyDict (``lib/config.py:9-119``), the yacs-style ``CfgNode``
(``lib/config.py:122-260``) and the LAVIS OmegaConf ``Config``
(``3DLLM_BLIP2-base/lavis/common/config.py:16-49``) — with one typed
dataclass tree that supports YAML load and dot-key CLI overrides.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Leaf config groups
# ---------------------------------------------------------------------------

@dataclass
class DataConfig:
    """SQA3D/ScanQA data pipeline. Mirrors lib/sepdataset.py + lib/config.py:81-119."""
    sqa_train: str = "assets/data/sqa/SQA_train.json"
    sqa_val: str = "assets/data/sqa/SQA_val.json"
    sqa_test: str = "assets/data/sqa/SQA_test.json"
    answer_counter: str = "assets/data/sqa/answer_counter.json"
    scene_dir: str = "assets/data/scannet_3d"
    scans_dir: str = "assets/data/scannet/scans"  # ScanNet meta with the
    # axisAlignment matrices (sepdataset.py:441-449); identity if absent
    max_text_len: int = 100            # CONF.TRAIN.MAX_TEXT_LEN (lib/config.py:51)
    num_answers: int = 706             # answer vocab size (answer_max_size train.py:46)
    answer_min_freq: int = 1           # train.py:45 answer_cands filtering
    voxel_size: float = 0.02           # CONF.OPENSCENE.voxel_size (lib/config.py:103)
    point_capacity: int = 65536        # fixed per-sample padded point budget
    voxel_capacity: int = 49152        # fixed per-sample padded voxel budget
    use_augmentation: bool = True      # CONF.TRAIN.USE_AUGMENTATION
    aug_rot_z: bool = True             # only rot-z enabled in reference (lib/config.py:83-87)
    aug_mirror: bool = False
    num_workers: int = 8
    tokenizer: str = "sentence-transformers/all-mpnet-base-v2"
    seed: int = 42


@dataclass
class SparseConfig:
    """Sparse voxel engine (MinkowskiEngine replacement). See sparse/."""
    # MinkUNet18A PLANES (situation3d/models/mink_unet.py:214-221)
    planes: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    init_dim: int = 32
    in_channels: int = 3
    out_channels: int = 768            # CLIP space (mink_unet.py DisNet)
    bottleneck_channels: int = 256     # feat_bottleneck consumed by SIG3D
    # fixed per-stride voxel capacities (stride 1,2,4,8,16) for static shapes
    capacities: Tuple[int, ...] = (49152, 24576, 12288, 6144, 3072)
    kernel_volume: int = 27            # 3x3x3
    # device plan builder: dense-grid neighbor lookup (one scatter per level
    # + O(1) gathers per query) vs sort-based search. The grid covers
    # [0, extent) stride-1 voxels (10.2 x 10.2 x 5.1 m at 0.02 m); scenes
    # beyond it fall back to the sort path via dense_lookup=False.
    dense_lookup: bool = True
    grid_extent: Tuple[int, ...] = (512, 512, 256)
    # run the full decoder tail + 768-d CLIP head (CONF.OPENSCENE.final_result,
    # lib/config.py:114): needed only for segmentation eval (eval.py:234-297)
    final_result: bool = False
    # same-stride k3 convs at strides >= this run as dense XLA conv3d over
    # the (small) coarse grid instead of per-offset gathers. Off by default:
    # measured slower than the gather path on v5e (5.39 -> 4.35 samples/s);
    # kept as an option for hardware where conv3d wins.
    dense_conv_min_stride: int = 0
    # serve conv gathers from a VMEM-resident Pallas kernel where the table
    # fits and rows span one lane tile (ops/pallas/gather.py; measured
    # 1.5-1.7x on the C=64/128 levels) instead of XLA's gather engine.
    pallas_gather: bool = True
    # fuse gather + mask + per-offset matmul into ONE Pallas kernel with
    # the feature table VMEM-resident (ops/pallas/fused_conv.py): the
    # K*V*C gathered-window intermediate never touches HBM, and packed
    # 128-lane rows (P = 128/C_in voxels/row) bring even the level-1
    # C_in=32 tables under the VMEM budget (the plain pallas_gather can't
    # hold them). True = auto (TPU only, falls back to pallas_gather /
    # XLA where the table doesn't fit); "force" = interpret mode on CPU
    # (tests). Takes precedence over pallas_gather where it applies.
    # Chip-measured (v5e B=8, r3): headline 11.63 -> 11.83 samples/s
    # end-to-end; per-conv 1.1-1.5x on every UNet shape except the
    # level-1 k3 class (routed back to XLA by fused_conv_wins).
    # r5: those wins were against the BATCHED take_along_axis baseline;
    # with the flat t[i] gathers (conv_flat_gather) the flat-XLA path
    # beats both Pallas paths on every class IN SITU — e2e A/B
    # "sparse.fused_conv=false": 17.65 (fused@C256 + vmem gathers) ->
    # 18.75 samples/s (all-flat) — so the default is now False and the
    # kernels stay as measured options (DESIGN.md §17 addendum).
    fused_conv: Any = False
    # conv0 (k5, stride 1) as a map-free z-window dense-feature-grid conv
    # (sparse/conv.py sparse_conv0_zwin): removes the level-0 k5 kernel map
    # (79% of per-sample map rows) and its 125 feature gathers entirely.
    # Requires dense_lookup (uses grid_extent).
    conv0_zwin: bool = True
    # conv0's z-window grid stored as int8 (per-channel affine quantized,
    # occupancy in the pad lane, affine folded into the phase weights —
    # sparse/conv.py sparse_conv0_zwin int8_grid). Isolated microbenches
    # promised 3.7x on the window gather (scripts/mb_int8_gather.py) but
    # EVERY formulation chip-measured a LOSS in situ (DESIGN.md §14):
    # e2e 13.32 -> 12.38 (take_along_axis) / 7.40 (flat gather — the
    # bitcast-born int8 grid inherits the int32 parent's tile geometry
    # and the row gather scalarizes, 25x slower than from a native int8
    # array). Kept as a measured option; exact for full-range byte
    # colors, kernel grads exact (tested).
    conv0_int8: bool = False
    # bf16 z-window grid probe-#4/#5 variants (sparse/conv.py
    # sparse_conv0_zwin, DESIGN.md §15). flat_gather: flat unbatched
    # t[i] window gather — bit-exact, conv0 36.0 -> 31.4 ms/sample in
    # situ, e2e 13.33 -> 14.20 samples/s interleaved A/B -> default ON.
    # unique_scatter: unique_indices on the grid scatter — measured
    # no-op for this .set scatter; kept as a knob, default OFF.
    conv0_flat_gather: bool = True
    conv0_unique_scatter: bool = False
    # flat 2-D grid scatter (probe #6: 15.5 vs batched 18.1 ms/sample on
    # the real rows; the scatter engine penalizes batching less than the
    # gather engine's 3x). Default decided by e2e A/B (DESIGN.md §18).
    conv0_flat_scatter: bool = False
    # gather-only backward for ALL UNet convs (sparse/conv.py
    # _sparse_conv_tmap): every conv's kernel-map transpose already
    # exists (k3/k5 maps are self-transpose under column reversal;
    # map_down/map_up are each other's transposes), so dx AND dW come
    # from ONE loop of K dy-gathers — no scatter-adds, no feats
    # re-gathers. Per-class 1.7-2.2x (mb_bwd_ab.py); unfrozen-encoder
    # train step 5.33 -> 8.12 samples/s interleaved A/B -> default ON.
    # No effect on the default frozen-encoder step (its UNet backward is
    # DCE'd either way). DESIGN.md §16.
    gather_bwd: bool = True
    # flat unbatched t[i] row gathers in the XLA per-offset conv paths
    # (forward fallback branch — i.e. the level-1 k3 class — and the
    # gather-only backward loops): the conv0-winning access-path switch
    # (§15) applied to the map-driven convs. In-situ interleaved probes
    # (scripts/mb_flat_convs.py): lvl1 fwd stack 17.9 -> 6.0 ms/sample
    # (2.98x — the class three formulations failed to crack, §9/§10);
    # backward loops 1.7-2.6x. e2e A/B 14.20 -> 17.36 samples/s (+22%)
    # -> default ON. DESIGN.md §17.
    conv_flat_gather: bool = True
    # sort-free downsample: grid occupancy + cumsum compaction instead of
    # one lax.sort per level per sample (kernel_map.downsample_coords_dense;
    # bit-identical order for in-extent scenes). Requires dense_lookup.
    # Chip-measured (v5e, B=8): headline 10.43 -> 11.63 samples/s (+11.5%).
    dense_downsample: bool = True
    # level-1 ResLayer k3 convs (C_in = 32 — the one conv class where both
    # Pallas paths measured slower than XLA's gather engine) as map-free
    # z-window dense-grid convs (sparse/conv.py sparse_conv_k3_zwin):
    # 12 contiguous 256 B window rows/voxel replace 27 64 B rows/voxel in
    # the XLA small-row regime, and the level-1 k3 kernel map + level-1
    # grid build drop out of the plan entirely (DCE). Requires dense_lookup.
    # True: per-conv form — chip-measured end-to-end LOSS (v5e B=8,
    # headline 11.82 -> 10.56 samples/s): unlike conv0, the per-conv
    # dense-grid scatter+memset is paid 4x per sample while the map it
    # deletes was shared by all 4 convs (DESIGN.md §10). Kept as a
    # measured option for hardware with faster memset/scatter.
    # "shared": whole-ResLayer form (conv.py zwin_res_layer_shared) — ONE
    # grid memset per sample, row-granular clear+add between convs,
    # hoisted index math; eval forwards only (training falls back to the
    # kernel-map path for whole-batch BN statistics). ALSO a chip-measured
    # LOSS (r4 interleaved A/B, B=8: 13.33 -> 10.50, b/a 0.788): with the
    # pallas_map_bits maps already off the gather engine there is no map
    # cost left to delete, and the z-window reads 3 KB/voxel vs the XLA
    # path's 1.7 KB on a bytes-bound engine (DESIGN.md §10).
    zwin_level1: Any = False
    # k3 kernel-map builds as a Pallas kernel on a VMEM-resident z-packed
    # level grid (ops/pallas/map_lookup.py): 27 elementwise XLA grid
    # gathers (~65 M single-int32 rows/s, the dominant residual plan cost)
    # become 9 dynamic-sublane row loads + 3 lane-select reduces per
    # voxel. Applies per level when the dense grid fits the 10 MB VMEM
    # budget: at the default grid_extent that is levels 2-4; level 1 (the
    # largest map) additionally needs grid_extent <= (320, 320, 128).
    # True = auto (TPU only); "force" = interpret mode on CPU (tests).
    # Chip-measured (v5e B=8, interleaved A/B): headline 11.83 -> 12.34
    # samples/s (+4.3%).
    pallas_map: Any = True
    # level-1 k3 map from a bit-packed VMEM occupancy grid + prefix
    # popcount rank table (ops/pallas/map_bits.py): the 33.5 MB level-1
    # int32 grid shrinks to 2.1 MB of VMEM tables and the grid build +
    # all level-1 map gathers (the largest remaining plan item,
    # DESIGN.md §10) leave the XLA gather engine. Valid only for levels
    # produced by the dense downsample (rank == row id needs ascending
    # flat order), so requires dense_downsample; applies wherever the
    # int32-grid Pallas kernel does NOT fit but the bit tables do.
    # True = auto (TPU only); "force" = interpret mode on CPU (tests).
    # Chip-measured (v5e B=8, interleaved A/B, 3 rounds): headline
    # 12.34 -> 13.34 samples/s (+8.1%).
    pallas_map_bits: Any = True


@dataclass
class ModelConfig:
    """SIG3D model (situation3d/models/sqa_module.py)."""
    hidden_size: int = 768             # CONF.TRAIN.HIDDEN_SIZE
    mcan_flat_mlp_size: int = 256      # train.py:89 default
    mcan_flat_glimpses: int = 1
    mcan_flat_out_size: int = 512      # train.py:91 default
    mcan_dropout: float = 0.1
    mcan_num_heads: int = 8
    mcan_num_layers: int = 2           # 2xSA / 2xSGA (sqa_module.py:176-184)
    mcan_ff_size: int = 2048
    num_scene_tokens: int = 256        # CONF.OPENSCENE.num_points (lib/config.py:104)
    scene_feat_dim: int = 256          # bottleneck channels
    lang_model: str = "mpnet"          # "mpnet" (BERT-style) | "lstm"
    lang_freeze: str = "last_layer"    # "all" | "last_layer" | "none"
    situation_loss_tag: str = "__l2__quat__"  # train.py:34 / scripts/train.sh:7
    answer_pdrop: float = 0.3
    pos_sigma: float = 0.16            # Gaussian loc-gt sigma (sqa_module.py:330)
    use_situation: bool = True         # CONF.TRAIN.USE_SITUATION
    predict_situation: bool = True     # CONF.TRAIN.PREDICT_SITUATION
    situated_reencode: bool = False    # rotate scene tokens into agent frame
    no_3d: bool = False                # CONF.TRAIN.NO3D
    dtype: str = "bfloat16"            # activation dtype on TPU


@dataclass
class LangConfig:
    """Language encoder (situation3d/models/sep_lang_module_bert.py)."""
    vocab_size: int = 30527            # mpnet vocab
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 514
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    relative_attention_num_buckets: int = 32  # MPNet uses relative position bias
    glove_dim: int = 300               # GloVe emb size for the LSTM variant
                                       # (sep_lang_module_bert.py emb_size)


@dataclass
class LossConfig:
    """Loss weights (lib/config.py:71-79, lib/loss_helper.py:230-302)."""
    answer_weight: float = 1.0
    aux_situation_weight: float = 1.0
    pos_weight: float = 1.0
    rot_weight: float = 1.0
    vote_weight: float = 0.0           # detection off by default
    objectness_weight: float = 0.0
    box_weight: float = 0.0
    sem_cls_weight: float = 0.0
    amplifier: float = 10.0            # loss *= 10 (loss_helper.py:300)
    answer_loss: str = "bce"           # "bce" (answer_cat_scores) | "ce" (answer_cat)


@dataclass
class TrainConfig:
    """Trainer (lib/solver.py + lavis runners)."""
    batch_size: int = 32
    epochs: int = 40
    lr: float = 2e-5
    weight_decay: float = 0.05
    lr_schedule: str = "step"          # "step" | "multistep" | "warmup_cosine" | "warmup_step"
    lr_decay_steps: Tuple[int, ...] = (15, 20, 25)   # epochs (train.sh recipe)
    lr_decay_rate: float = 0.1
    warmup_steps: int = 1000
    min_lr: float = 1e-5
    grad_clip_value: float = 1.0       # clip_grad_value_ (solver.py:624)
    grad_accum_steps: int = 1
    bn_momentum_init: float = 0.5      # BNMomentumScheduler (solver.py:249-257)
    bn_momentum_decay: float = 0.5
    bn_momentum_step: int = 20
    val_every_steps: int = 1000        # val_step (solver.py:437)
    # RunnerIter parity (runner_iter.py:25-60): iteration-based training.
    # max_iters > 0 bounds total optimizer steps; iters_per_inner_epoch > 0
    # sets the val/checkpoint cadence in steps (an "inner epoch"); 0 falls
    # back to epoch-based cadence (RunnerBase).
    max_iters: int = 0
    iters_per_inner_epoch: int = 0
    log_every_steps: int = 50
    ckpt_dir: str = "outputs/ckpt"
    ckpt_keep: int = 3
    seed: int = 42
    frozen_prefixes: Tuple[str, ...] = ("scene_encoder",)  # no_update_filter openscene_net
    bf16: bool = True
    donate_state: bool = True
    # NaN guard — the TPU analogue of the reference's always-on
    # torch.autograd.set_detect_anomaly(True) (solver.py:374). Modes:
    #   "loss" (default): skip the update when the LOSS is non-finite —
    #     the grad rewrite is measured free, and a NaN loss is how training
    #     blowups overwhelmingly present;
    #   "full": additionally check every trainable gradient leaf — XLA
    #     does not fuse the ~330 per-leaf reductions into the backward,
    #     measured +39% step time (like detect_anomaly, a debugging mode);
    #   "off": no guard.
    nan_guard: str = "loss"


@dataclass
class MeshConfig:
    """Device mesh / parallelism (parallel/mesh.py). Replaces NCCL DDP."""
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1            # -1 => all devices
    model_parallel: int = 1
    allow_split_physical_axes: bool = True


@dataclass
class QFormerConfig:
    """Q-Former (3DLLM_BLIP2-base/lavis/models/blip2_models/Qformer.py)."""
    num_query_tokens: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_freq: int = 2      # blip2.py:120 init_Qformer
    encoder_width: int = 1408          # eva_vit num_features (eva_vit.py:310)
    vocab_size: int = 30523            # bert-base + 64 loc tokens (blip2.py:31-36)
    max_position: int = 512
    layer_norm_eps: float = 1e-12
    scene_token_capacity: int = 5120   # 5000 scene tokens padded to tile multiple


@dataclass
class T5Config:
    """FlanT5 (vendored modeling_t5.py). Defaults sized for flan-t5-xl."""
    vocab_size: int = 65536            # 32128 + 32768 loc tokens, padded (blip2_t5.py:73-82)
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 32
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu"         # override at load (blip2_t5.py:79)
    is_gated_act: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    max_input_len: int = 480           # 32 query + <=400 prompt padded
    max_answer_len: int = 50
    tie_word_embeddings: bool = False
    remat: bool = False                # jax.checkpoint each block (training
                                       # memory <-> recompute trade)


@dataclass
class Blip2Config:
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    t5: T5Config = field(default_factory=T5Config)
    pc_feat_dim: int = 1408
    pos_scale: float = 0.01            # 0.01 x sinusoidal xyz (blip2_t5.py:106-118)
    prompt: str = "Question: {} Answer:"
    max_txt_len: int = 400
    freeze_t5_except_embeddings: bool = True   # blip2_t5.py:84-89


@dataclass
class EvalConfig:
    batch_size: int = 32
    split: str = "val"
    pos_thresholds: Tuple[float, ...] = (0.5, 1.0)     # meters
    rot_thresholds: Tuple[float, ...] = (15.0, 30.0)   # degrees
    num_beams: int = 1                 # beam=1 forced (blip2_t5.py:320)
    max_gen_len: int = 10
    output_dir: str = "outputs/eval"


@dataclass
class LogConfig:
    use_wandb: bool = False
    use_tensorboard: bool = False
    project: str = "situation3d_tpu"
    log_dir: str = "outputs/logs"
    profile_steps: Tuple[int, int] = (0, 0)  # (start, stop) jax.profiler window; (0,0)=off


@dataclass
class Config:
    """Root config."""
    data: DataConfig = field(default_factory=DataConfig)
    sparse: SparseConfig = field(default_factory=SparseConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    lang: LangConfig = field(default_factory=LangConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    blip2: Blip2Config = field(default_factory=Blip2Config)
    eval: EvalConfig = field(default_factory=EvalConfig)
    log: LogConfig = field(default_factory=LogConfig)


# ---------------------------------------------------------------------------
# YAML load / dot-key override machinery
# ---------------------------------------------------------------------------

def _coerce(value: Any, target_type: Any) -> Any:
    """Coerce a YAML/CLI value to the annotated field type."""
    if target_type in (int, float, str, bool):
        if target_type is bool and isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return target_type(value)
    origin = getattr(target_type, "__origin__", None)
    if origin in (tuple, Tuple):
        if value is None:  # "key=" on the CLI means an empty tuple
            return ()
        if isinstance(value, str):
            value = [v for v in value.strip("()[]").split(",") if v.strip()]
        args = getattr(target_type, "__args__", ())
        elem = args[0] if args and args[-1] is Ellipsis else None
        if elem is not None:
            return tuple(_coerce(v, elem) for v in value)
        return tuple(value)
    if origin in (list, List):
        return list(value)
    return value


def _merge_dataclass(cfg: Any, overrides: dict) -> Any:
    """Return a copy of dataclass ``cfg`` with nested dict ``overrides`` applied."""
    kwargs = {}
    by_name = {f.name: f for f in fields(cfg)}
    for key, val in overrides.items():
        if key not in by_name:
            raise KeyError(
                f"Unknown config key {key!r} for {type(cfg).__name__}; "
                f"valid keys: {sorted(by_name)}"
            )
        f = by_name[key]
        cur = getattr(cfg, key)
        if is_dataclass(cur):
            if not isinstance(val, dict):
                raise TypeError(f"Config group {key!r} expects a mapping, got {val!r}")
            kwargs[key] = _merge_dataclass(cur, val)
        else:
            kwargs[key] = _coerce(val, f.type if not isinstance(f.type, str)
                                  else _resolve_type(f))
    return dataclasses.replace(cfg, **kwargs)


def _resolve_type(f) -> Any:
    # dataclass field types may be strings under `from __future__ import annotations`
    import typing
    ns = {**globals(), **vars(typing)}
    try:
        return eval(f.type, ns)  # noqa: S307 - types defined in this module
    except Exception:
        return str


def apply_overrides(cfg: Config, options: List[str]) -> Config:
    """Apply ``a.b.c=value`` dot-key overrides (LAVIS ``--options`` analogue)."""
    tree: dict = {}
    for opt in options:
        if "=" not in opt:
            raise ValueError(f"Override must be key=value, got {opt!r}")
        key, val = opt.split("=", 1)
        try:
            val = yaml.safe_load(val)
        except yaml.YAMLError:
            pass
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _merge_dataclass(cfg, tree)


def load_config(path: Optional[str] = None, options: Optional[List[str]] = None) -> Config:
    """Load a Config from a YAML file (optional) plus dot-key overrides."""
    cfg = Config()
    if path:
        with open(path) as fh:
            data = yaml.safe_load(fh) or {}
        cfg = _merge_dataclass(cfg, data)
    if options:
        cfg = apply_overrides(cfg, options)
    return cfg


def to_dict(cfg: Any) -> Any:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as fh:
        yaml.safe_dump(to_dict(cfg), fh, sort_keys=False)
