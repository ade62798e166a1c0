"""YAML config system with dataclass validation.

Same single-source-YAML surface as the reference (``config/default.yaml`` parsed
once at startup, sub-dicts passed to constructors -- reference
``tools/run_pipeline.py:46-117``), plus what the reference lacks: typed schema
validation with helpful errors, and a ``parallel`` section for the TPU mesh.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import yaml

from rtmodt_tpu.utils.logging import logger

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def default_config_path() -> str:
    return os.path.join(_PKG_DIR, "default.yaml")


def load_yaml(path: str) -> dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


@dataclass
class SystemConfig:
    device: str = "tpu"           # tpu | cpu (jax platform preference)
    precision: str = "bf16"       # bf16 | fp32
    log_level: str = "INFO"
    log_dir: str = "logs"
    output_dir: str = "outputs"


@dataclass
class IngestionConfig:
    source: str | int = 0
    backend: str = "opencv"       # opencv | gstreamer
    reconnect_delay_sec: float = 2.0
    max_reconnects: int = 10
    buffer_size: int = 1
    target_fps: int = 0           # 0 = native
    resolution: list[int] | None = None  # [w, h] override


@dataclass
class DetectionConfig:
    model: str = "yolov8s"
    weights: str | None = None          # orbax dir / converted .npz / ultralytics .pt
    fallback_weights: str | None = None
    num_classes: int = 80
    input_size: int = 640
    batch_size: int = 1
    conf_threshold: float = 0.35
    iou_threshold: float = 0.45
    max_detections: int = 100
    nms_candidates: int = 300           # top-k pool entering NMS (static shape)
    classes: list[int] | None = None    # keep-list, e.g. [0,1,2,3,5,7]
    agnostic_nms: bool = False
    nms_impl: str = "fixpoint"          # fixpoint (XLA, fastest batched) |
                                        # pallas (fused kernel) | auto
    topk_impl: str = "exact"            # exact (lax.top_k full sort) |
                                        # approx (TPU PartialReduce bucketed
                                        # candidate top-k; identical on CPU)
    fuse_bn: bool = True                # fold BN into convs for inference
    half: bool = True                   # bf16 on TPU
    quant: str = "none"                 # none | int8 (PTQ, v5e int8 MXU path;
                                        # reference's TRT INT8 analog)
    calib_frames: int = 4               # synthetic calibration batches at init;
                                        # Detector.calibrate(frames) requantizes
                                        # on real data
    quant_scales: str | None = None     # frozen activation scales from QAT
                                        # (tools/train.py --qat-steps writes
                                        # qat_act_scales.npz); requires
                                        # quant=int8


@dataclass
class ByteTrackConfig:
    track_thresh: float = 0.5
    track_buffer: int = 30
    match_thresh: float = 0.8
    low_thresh: float = 0.1
    # birth gate: an unmatched high det also needs conf >= this to start a
    # track. Defaults to track_thresh (gate is a no-op); canonical ByteTrack
    # uses track_thresh + 0.1 to suppress low-confidence ghost births
    new_track_thresh: float = 0.5
    max_tracks: int = 256               # static track-slot count (device state)
    motion_model: str = "kalman"        # kalman | none (reference-compat)
    assignment: str = "greedy"          # greedy (device) | lapjv (host C++)
    fuse_score: bool = False            # stage-1 similarity = IoU * det conf
    gate_distance: bool = False         # Mahalanobis chi2inv95(4dof) gate
    # Acceptance semantics of match_thresh:
    #   iou          - accept when IoU >= match_thresh (REFERENCE-compat:
    #                  reference tracker.py:170 passes cost_limit=1-thresh,
    #                  so 0.8 demands 80% overlap - far stricter than
    #                  canonical ByteTrack and prone to id churn under fast
    #                  motion; select for bit-parity with the reference's
    #                  association);
    #   iou_distance - accept when 1 - IoU <= match_thresh (canonical
    #                  ByteTrack matching.py semantics: 0.8 accepts IoU >=
    #                  0.2).  DEFAULT: measured IDF1 0.51 vs 0.034 under
    #                  fast-motion occlusion (docs/RESULTS.md tracker
    #                  comparison); the reference's own gate is an artifact
    #                  of its lap cost_limit plumbing, not a design choice.
    match_metric: str = "iou_distance"
    mot20: bool = False


@dataclass
class DeepSortConfig:
    """Appearance-based tracker (reference declares this block at
    default.yaml:53-60 but its code raises NotImplementedError;
    here it is a working, jittable tracker - see tracking/deepsort.py)."""

    max_dist: float = 0.2               # appearance cosine-distance gate
    min_confidence: float = 0.3
    max_iou_distance: float = 0.7
    max_age: int = 70
    n_init: int = 3
    nn_budget: int = 100                # canonical gallery budget; realized as
                                        # an EMA gallery (see deepsort.py)
    embedder: str = ""                  # optional embedder weights (.npz);
                                        # deterministic random init otherwise
    embed_dim: int = 128
    crop_hw: list[int] = field(default_factory=lambda: [64, 32])  # ROI h, w
    max_tracks: int = 256               # static track-slot count (device state)
    ema_alpha: float = 0.9              # appearance EMA momentum
    gate_distance: bool = True          # Mahalanobis chi2(4dof) gate in stage 1


@dataclass
class BotSortConfig:
    """BoT-SORT (framework extension; tracking/botsort.py): ByteTrack's
    confidence-split two-stage association with a fused motion+appearance
    cost - ``min(IoU distance, gated cosine distance)`` - per the BoT-SORT
    paper (Aharon et al. 2022).  Camera-motion compensation (the paper's
    other half) is the shared ``tracking.gmc`` block, applied on device.
    Defaults follow the canonical repo's MOT17 configuration."""

    track_thresh: float = 0.5           # high/low confidence split
    low_thresh: float = 0.1             # BYTE stage floor
    match_thresh: float = 0.8           # stage-1 accept: fused dist <= thresh
    low_match_thresh: float = 0.5       # stage-2 accept: 1 - IoU <= thresh
    new_track_thresh: float = 0.6       # birth gate (canonical: high+0.1)
    track_buffer: int = 30              # frames a lost track survives
    proximity_thresh: float = 0.5       # appearance only when 1-IoU <= this
    appearance_thresh: float = 0.25     # cosine-distance/2 acceptance cut
    fuse_score: bool = True             # stage-1 IoU similarity *= det conf
    ema_alpha: float = 0.9              # appearance gallery EMA momentum
    embedder: str = ""                  # embedder weights chain (as deepsort)
    embed_dim: int = 128
    crop_hw: list[int] = field(default_factory=lambda: [64, 32])
    max_tracks: int = 256               # static track-slot count (device state)


@dataclass
class OCSortConfig:
    """Observation-Centric SORT (framework extension; tracking/ocsort.py).

    Defaults follow the canonical OC-SORT repo's MOT configuration."""

    det_thresh: float = 0.6             # high-confidence association gate
    low_thresh: float = 0.1             # BYTE stage floor (use_byte)
    iou_threshold: float = 0.3          # raw-IoU acceptance for every stage
    max_age: int = 30                   # frames a lost track survives
    min_hits: int = 3                   # consecutive matches before emit
    delta_t: int = 3                    # OCM momentum horizon (observations)
    vdc_weight: float = 0.2             # velocity-direction consistency weight
    use_byte: bool = False              # BYTE-style low-score second stage
    max_tracks: int = 256               # static track-slot count (device state)


@dataclass
class GMCConfig:
    """Camera (global) motion compensation - framework extension
    (ops/gmc.py; the reference has none).  With ``method: phase`` the
    dominant scene translation between consecutive frames is estimated by
    FFT phase correlation of downsampled luma grids ON DEVICE and applied
    to every tracker's state before association, so pans/tilts don't churn
    track ids.  Applies to all three trackers."""

    method: str = "none"                # none | phase (FFT phase correlation)
    grid: int = 128                     # luma correlation raster (G x G)
    min_ratio: float = 1.5              # peak/second-peak confidence gate
    max_shift_frac: float = 0.25        # reject |shift| > grid * frac


@dataclass
class TrackingConfig:
    algorithm: str = "bytetrack"
    trail_length: int = 30
    gmc: GMCConfig = field(default_factory=GMCConfig)
    bytetrack: ByteTrackConfig = field(default_factory=ByteTrackConfig)
    deepsort: DeepSortConfig = field(default_factory=DeepSortConfig)
    botsort: BotSortConfig = field(default_factory=BotSortConfig)
    ocsort: OCSortConfig = field(default_factory=OCSortConfig)


@dataclass
class ZoneConfig:
    name: str = "zone"
    polygon: list[list[float]] = field(default_factory=list)
    trigger: str = "intrusion"          # intrusion | crossing
    direction: str | None = None        # for crossing zones
    dwell_time_sec: float = 2.0
    cooldown_sec: float = 10.0
    classes: list[int] | None = None    # optional class keep-list (extension)


@dataclass
class AlertConfig:
    backend: str = "json_file"          # json_file | webhook | mqtt
    log_path: str = "logs/events.jsonl"
    webhook_url: str = ""
    mqtt_host: str = ""                 # broker for backend=mqtt
    mqtt_port: int = 1883
    mqtt_topic: str = "rtmodt/events"


@dataclass
class EventsConfig:
    enabled: bool = True
    zones: list[ZoneConfig] = field(default_factory=list)
    alert: AlertConfig = field(default_factory=AlertConfig)
    clock: str = "stream"               # stream (frame-timestamp) | wall (reference-compat)
    max_vertices: int = 16              # polygon padding for static shapes
    device_masks: bool = False          # compute zone containment inside the
                                        # jitted chunk step (host does only
                                        # dwell/cooldown bookkeeping)


@dataclass
class ProfilingConfig:
    enabled: bool = True
    warmup_frames: int = 50
    log_interval: int = 100
    per_stage: bool = True              # False = fully-fused single XLA step (max perf)
    trace_dir: str | None = None        # capture a jax.profiler trace here
    trace_frames: int = 20              # frames to include in the trace


@dataclass
class VisualizationConfig:
    enabled: bool = True
    show_boxes: bool = True
    show_labels: bool = True
    show_trails: bool = True
    show_zones: bool = True
    show_hud: bool = True
    trail_length: int = 30
    save_video: bool = False
    save_path: str = "outputs/annotated.mp4"
    codec: str = "mp4v"                 # cv2 fourcc for save_video
    window_name: str = "RTMODT-TPU"     # --display window title
    mjpeg_port: int | None = None       # serve annotated frames as MJPEG
                                        # (0 = OS-picked port; headless live view)


@dataclass
class ParallelConfig:
    """TPU mesh / multi-stream settings (no reference analog -- see SURVEY.md 2.3)."""

    num_streams: int = 1
    mesh_axes: dict[str, int] = field(default_factory=dict)  # e.g. {"data": 8}
    donate_state: bool = True
    pipeline_depth: int = 2   # in-flight frames between submit and host consume
                              # (hides host<->device latency; 0 = lowest latency)
    chunk_size: int = 1       # >1: run() batches frames into lax.scan chunks
                              # (throughput mode for file/offline sources)
    transport: str = "packed" # packed (auto: highest eligible s2d layout -
                              # x24 where dims allow, else x6, else planar
                              # I420 - same bytes on the wire either way)
                              # | x6 / x24 (pin a space-to-depth level)
                              # | i420 (pin planar I420)
                              # | bgr (raw frames; deepsort/per-stage always bgr)


@dataclass
class PipelineConfig:
    system: SystemConfig = field(default_factory=SystemConfig)
    ingestion: IngestionConfig = field(default_factory=IngestionConfig)
    detection: DetectionConfig = field(default_factory=DetectionConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    events: EventsConfig = field(default_factory=EventsConfig)
    profiling: ProfilingConfig = field(default_factory=ProfilingConfig)
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)


def _build(cls: type, data: Any, path: str) -> Any:
    """Recursively construct a dataclass from a dict, erroring on unknown keys."""
    if data is None:
        return cls()
    if not isinstance(data, dict):
        raise TypeError(f"config section '{path}' must be a mapping, got {type(data).__name__}")
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(f"unknown config key(s) {sorted(unknown)} in section '{path}'; "
                       f"valid keys: {sorted(fields)}")
    kwargs: dict[str, Any] = {}
    for name, f in fields.items():
        if name not in data:
            continue
        value = data[name]
        ftype = f.type if isinstance(f.type, type) else None
        if dataclasses.is_dataclass(f.default_factory() if f.default_factory is not dataclasses.MISSING else None):  # type: ignore[misc]
            sub_cls = type(f.default_factory())  # type: ignore[misc]
            if name == "zones" and isinstance(value, list):
                kwargs[name] = value
            else:
                kwargs[name] = _build(sub_cls, value, f"{path}.{name}")
        elif name == "zones" and isinstance(value, list):
            kwargs[name] = [_build(ZoneConfig, z, f"{path}.zones[{i}]") for i, z in enumerate(value)]
        elif name == "bytetrack":
            kwargs[name] = _build(ByteTrackConfig, value, f"{path}.bytetrack")
        else:
            kwargs[name] = value
        del ftype
    return cls(**kwargs)


# Reference config-key compatibility (``config/default.yaml`` of the
# reference): a user's existing YAML loads unmodified.  Maps
# (section, reference_key) -> our key, or None for keys with no analog here
# (accepted and logged rather than rejected).  Renames are also documented
# in docs/MIGRATION.md.
_REFERENCE_ALIASES: dict[tuple[str, str], str | None] = {
    ("detection", "confidence_threshold"): "conf_threshold",
    ("detection", "nms_iou_threshold"): "iou_threshold",
    ("detection", "model_path"): "weights",
    ("detection", "fallback_model"): "fallback_weights",
    ("ingestion", "max_reconnect_attempts"): "max_reconnects",
    ("ingestion", "drop_stale_frames"): None,   # latest-frame is the live default here
    ("profiling", "gpu_sync"): None,            # TPU path always fetch-syncs
    ("profiling", "log_interval_frames"): "log_interval",
    ("system", "num_workers"): None,            # ingest threading is automatic
    ("visualization", "show_fps"): "show_hud",
    ("visualization", "show_ids"): "show_labels",
}


def _apply_reference_aliases(raw: dict) -> dict:
    """Translate reference key names in place so reference YAMLs load."""
    for (section, ref_key), ours in _REFERENCE_ALIASES.items():
        sec = raw.get(section)
        if not isinstance(sec, dict) or ref_key not in sec:
            continue
        value = sec.pop(ref_key)
        if ours is None:
            logger.info(f"config: reference key {section}.{ref_key} has no "
                        f"TPU analog; ignored")
        else:
            sec.setdefault(ours, value)
            logger.info(f"config: reference key {section}.{ref_key} -> "
                        f"{section}.{ours}")
    # reference resolution is {width, height}; ours is [w, h].  Sections may
    # be present but empty ('ingestion:' alone parses as None) - guard.
    res = (raw.get("ingestion") or {}).get("resolution")
    if isinstance(res, dict):
        raw["ingestion"]["resolution"] = [res.get("width"), res.get("height")]
    # reference input_size is [w, h]; ours is the square letterbox side
    size = (raw.get("detection") or {}).get("input_size")
    if isinstance(size, (list, tuple)):
        raw["detection"]["input_size"] = int(max(size))
        logger.info(f"config: reference detection.input_size {list(size)} -> "
                    f"square {raw['detection']['input_size']} (letterbox side)")
    return raw


def load_config(path: str | None = None, overrides: dict[str, Any] | None = None) -> PipelineConfig:
    """Load and validate a pipeline config.

    ``overrides`` is a nested dict merged on top of the YAML (used by CLI flags,
    analogous to the reference's source-override mutation at
    ``tools/run_pipeline.py:50-51``).  Reference-format YAMLs (the upstream
    ``config/default.yaml`` key names) are accepted via ``_REFERENCE_ALIASES``.
    """
    raw = _apply_reference_aliases(load_yaml(path or default_config_path()))
    if overrides:
        raw = _deep_merge(raw, overrides)
    cfg = PipelineConfig(
        system=_build(SystemConfig, raw.get("system"), "system"),
        ingestion=_build(IngestionConfig, raw.get("ingestion"), "ingestion"),
        detection=_build(DetectionConfig, raw.get("detection"), "detection"),
        tracking=_build(TrackingConfig, raw.get("tracking"), "tracking"),
        events=_build(EventsConfig, raw.get("events"), "events"),
        profiling=_build(ProfilingConfig, raw.get("profiling"), "profiling"),
        visualization=_build(VisualizationConfig, raw.get("visualization"), "visualization"),
        parallel=_build(ParallelConfig, raw.get("parallel"), "parallel"),
    )
    _validate(cfg)
    return cfg


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _validate(cfg: PipelineConfig) -> None:
    if cfg.parallel.transport not in ("packed", "x6", "x24", "i420", "bgr"):
        raise ValueError("parallel.transport must be packed|x6|x24|i420|"
                         f"bgr, got {cfg.parallel.transport!r}")
    if (cfg.parallel.transport in ("x6", "x24")
            and cfg.detection.quant != "none"):
        raise ValueError(f"parallel.transport={cfg.parallel.transport} "
                         "requires detection.quant=none (int8 intercepts "
                         "the Flax modules the s2d front bypasses); use "
                         "transport=packed for auto")
    if (cfg.parallel.transport in ("x6", "x24")
            and cfg.tracking.algorithm in ("deepsort", "botsort")):
        raise ValueError(f"parallel.transport={cfg.parallel.transport} is "
                         "incompatible with tracking.algorithm="
                         f"{cfg.tracking.algorithm!r}: appearance trackers "
                         "need the Y/U/V planes back for ROI embedding "
                         "crops, which a space-to-depth layout does not "
                         "carry; use transport=packed (auto-selects planes "
                         "for appearance trackers) or i420")
    alert = cfg.events.alert
    if alert.backend not in ("json_file", "webhook", "mqtt"):
        raise ValueError("events.alert.backend must be json_file|webhook|mqtt, "
                         f"got {alert.backend!r}")
    if alert.backend == "mqtt" and not alert.mqtt_host:
        raise ValueError("events.alert.backend=mqtt requires "
                         "events.alert.mqtt_host")
    if alert.backend == "webhook" and not alert.webhook_url:
        raise ValueError("events.alert.backend=webhook requires "
                         "events.alert.webhook_url")
    d = cfg.detection
    if not (0.0 <= d.conf_threshold <= 1.0):
        raise ValueError(f"detection.conf_threshold must be in [0,1], got {d.conf_threshold}")
    if not (0.0 <= d.iou_threshold <= 1.0):
        raise ValueError(f"detection.iou_threshold must be in [0,1], got {d.iou_threshold}")
    if d.input_size % 32 != 0:
        raise ValueError(f"detection.input_size must be a multiple of 32, got {d.input_size}")
    if d.max_detections > d.nms_candidates:
        raise ValueError("detection.max_detections cannot exceed detection.nms_candidates")
    if d.classes is not None:
        bad = [c for c in d.classes
               if not isinstance(c, int) or not 0 <= c < d.num_classes]
        if bad:
            raise ValueError(
                f"detection.classes entries must be ints in [0, "
                f"{d.num_classes}), got {bad} (negative ids would silently "
                f"wrap to the wrong class)")
    if d.quant not in ("none", "int8"):
        raise ValueError(f"detection.quant must be none|int8, got {d.quant}")
    if d.topk_impl not in ("exact", "approx"):
        raise ValueError("detection.topk_impl must be exact|approx, "
                         f"got {d.topk_impl!r}")
    if d.quant == "int8" and not d.fuse_bn:
        raise ValueError("detection.quant=int8 requires detection.fuse_bn=true "
                         "(quantization folds conv+BN+SiLU)")
    if d.quant_scales and d.quant != "int8":
        raise ValueError("detection.quant_scales (QAT frozen scales) requires "
                         "detection.quant=int8")
    vz = cfg.visualization
    if vz.mjpeg_port is not None and not (
            isinstance(vz.mjpeg_port, int) and 0 <= vz.mjpeg_port <= 65535):
        raise ValueError("visualization.mjpeg_port must be an int in "
                         f"[0, 65535] or null, got {vz.mjpeg_port!r}")
    bt = cfg.tracking.bytetrack
    if bt.motion_model not in ("kalman", "none"):
        raise ValueError(f"tracking.bytetrack.motion_model must be kalman|none, got {bt.motion_model}")
    if bt.assignment not in ("greedy", "lapjv"):
        raise ValueError(f"tracking.bytetrack.assignment must be greedy|lapjv, got {bt.assignment}")
    if cfg.tracking.algorithm not in ("bytetrack", "deepsort", "botsort", "ocsort"):
        raise ValueError(f"tracking.algorithm must be bytetrack|deepsort|botsort|"
                         f"ocsort, got {cfg.tracking.algorithm}")
    g = cfg.tracking.gmc
    if g.method not in ("none", "phase"):
        raise ValueError(f"tracking.gmc.method must be none|phase, got {g.method}")
    if g.grid < 32:
        raise ValueError(f"tracking.gmc.grid must be >= 32, got {g.grid}")
    if g.min_ratio < 1.0:
        raise ValueError(f"tracking.gmc.min_ratio must be >= 1.0, got {g.min_ratio}")
    if g.method == "phase" and cfg.tracking.bytetrack.assignment == "lapjv" \
            and cfg.tracking.algorithm == "bytetrack":
        raise ValueError("tracking.gmc is device-side and not supported with "
                         "the host lapjv backend (assignment: lapjv)")
    oc = cfg.tracking.ocsort
    if oc.min_hits < 1:
        raise ValueError(f"tracking.ocsort.min_hits must be >= 1, got {oc.min_hits}")
    if oc.delta_t < 1:
        raise ValueError(f"tracking.ocsort.delta_t must be >= 1, got {oc.delta_t}")
    if not (0.0 <= oc.iou_threshold < 1.0):
        raise ValueError(f"tracking.ocsort.iou_threshold must be in [0, 1), "
                         f"got {oc.iou_threshold}")
    bs = cfg.tracking.botsort
    if not (0.0 <= bs.proximity_thresh <= 1.0):
        raise ValueError(f"tracking.botsort.proximity_thresh must be in [0, 1], "
                         f"got {bs.proximity_thresh}")
    if not (0.0 < bs.appearance_thresh <= 1.0):
        raise ValueError(f"tracking.botsort.appearance_thresh must be in (0, 1], "
                         f"got {bs.appearance_thresh}")
    if len(bs.crop_hw) != 2 or any(v <= 0 for v in bs.crop_hw):
        raise ValueError(f"tracking.botsort.crop_hw must be [h, w] > 0, got {bs.crop_hw}")
    ds = cfg.tracking.deepsort
    if ds.n_init < 1:
        raise ValueError(f"tracking.deepsort.n_init must be >= 1, got {ds.n_init}")
    if not (0.0 < ds.max_dist <= 2.0):
        raise ValueError(f"tracking.deepsort.max_dist must be in (0, 2], got {ds.max_dist}")
    if len(ds.crop_hw) != 2 or any(v <= 0 for v in ds.crop_hw):
        raise ValueError(f"tracking.deepsort.crop_hw must be [h, w] > 0, got {ds.crop_hw}")
    for z in cfg.events.zones:
        if len(z.polygon) < 3:
            raise ValueError(f"events zone '{z.name}' polygon needs >= 3 vertices")
        if len(z.polygon) > cfg.events.max_vertices:
            raise ValueError(f"events zone '{z.name}' polygon exceeds events.max_vertices "
                             f"({cfg.events.max_vertices}); raise the limit in config")
