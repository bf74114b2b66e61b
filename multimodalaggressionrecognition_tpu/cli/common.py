"""Shared CLI config machinery.

Dataclass configs with auto-generated argparse — fixing the reference's
config quirk where every script passed a hard-coded `sample_args` list to
`parse_args`, silently ignoring the real command line (reference
train_multimodal.py:51-74 and every other train_* script).  Here real CLI
flags override dataclass defaults; `--synthetic` provisions the synthetic
AVABOS fixture when no dataset exists (the real AVABOS corpus is private).
"""

import argparse
import dataclasses
import os
from dataclasses import dataclass, field


@dataclass
class TrainConfig:
    dataset_root: str = "data/avabos"
    saving_dir: str = "runs"
    model_name: str = ""
    # Stable run directory name (<saving_dir>/<run_name>) instead of the
    # reference's timestamped dirs: a relaunch with identical args lands in
    # the same directory and AUTO-RESUMES from its latest checkpoint —
    # checkpoint_preempt (mid-epoch SIGTERM state) first, then
    # checkpoint_current.  This is how a scheduler restart after
    # preemption picks up where it left off without extra flags.
    run_name: str = ""
    batch_size: int = 16
    epoch_num: int = 50
    learning_rate: float = 1e-3  # torch.optim.Adam default, as the reference
    seed: int = 0
    checkpoint_criterion: str = "UAR"
    resume_training: bool = False
    path_to_checkpoint: str = ""
    synthetic: bool = False
    num_threads: int = 4
    log_console: bool = True
    lr_schedule: str = "constant"   # constant | cosine | exponential
    lr_decay_steps: int = 10000
    lr_decay_rate: float = 0.95
    # Production-training knobs (beyond the reference's plain Adam):
    warmup_steps: int = 0           # linear LR warmup prepended to any schedule
    grad_clip_norm: float = 0.0     # 0 = off; else clip_by_global_norm
    weight_decay: float = 0.0       # 0 = Adam (reference-exact); else AdamW
    grad_accum_steps: int = 1       # micro-batches per optimizer update
    ema_decay: float = 0.0          # 0 = off; else eval/serve with EMA params
    early_stop_patience: int = 0    # 0 = off; else stop after N flat epochs
    # 'float32' (default, reference-exact) or 'bfloat16' (MXU-native mixed
    # precision: f32 master params/losses/BN stats, bf16 matmuls/convs)
    compute_dtype: str = "float32"
    # persistent XLA compilation cache dir ('' = off): restarts skip the
    # minutes-long first compile (utils/compile_cache.py)
    compilation_cache_dir: str = ""
    # Tensor parallelism degree N (>1 builds a (devices/N data) x (N model)
    # mesh: batches sharded on `data`, transformer qkv/out/MLP kernels
    # Megatron-sharded on `model` — parallel/sharding_rules.py).  1 = off.
    # The reference has no parallelism at all (SURVEY.md §2.6).
    model_parallelism: int = 1
    # Pure data parallelism over ALL local devices (batch sharded on a 1-D
    # `data` mesh, params/optimizer replicated; XLA inserts the gradient
    # all-reduce over ICI).  Implied by model_parallelism > 1.
    data_parallel: bool = False
    # jax.profiler trace of one training epoch ('' = off): writes an xplane
    # trace viewable in TensorBoard/Perfetto (utils/profiling.py).  The
    # traced epoch defaults to 1 so the epoch-0 compile doesn't drown the
    # steps; set profile_epoch 0 to trace compile too.
    profile_dir: str = ""
    profile_epoch: int = 1
    # live TensorBoard scalars (<head>/<split>/<metric> per epoch) next to
    # the CSV/PNG artifacts; '' = off.  Point it at the same TensorBoard
    # logdir as --profile_dir to see curves and profiler traces together.
    tensorboard_dir: str = ""


@dataclasses.dataclass
class NamesPinConfig(TrainConfig):
    """TrainConfig + the reference's train_names.txt order pin for the
    flat filename-labeled dataset CLIs (extract_features, train_{text,
    audio,video}_transformer, train_{audio,video}_rnn).

    The reference reads `train_names.txt` and iterates the dataset in
    exactly that file order (extract_video_features.py:31-42,
    extract_audio_features.py:33-44); the framework default is a sorted
    directory listing (DIVERGENCES.md).  `--train_names/--test_names`
    point at newline-separated filename lists that fix a split's
    membership AND iteration order to reproduce a reference run exactly.
    """
    train_names: str = ""   # path to a names .txt for the train split
    test_names: str = ""    # path to a names .txt for the test split


def pinned_files(cfg, split: str):
    """`files=` for FilenameLabelSource from --{split}_names ('' -> None =
    sorted directory listing)."""
    path = getattr(cfg, f"{split}_names", "")
    if not path:
        return None
    from ..data.files import read_names_file

    return read_names_file(path)


def clip_shapes_from_config(cfg, modalities):
    """Per-modality single-clip shapes under this config's padding — the
    ONE definition shared by the serving daemon (cli/serve.py) and the
    export CLI (cli/export_model.py) so artifacts and live servers can
    never disagree on padding."""
    all_shapes = {"audio": (cfg.audio_samples,),
                  "text": (cfg.text_tokens, cfg.hidden_size),
                  "video": (cfg.video_frames, cfg.video_size,
                            cfg.video_size, 3)}
    return {m: all_shapes[m] for m in modalities}


def _parse_bool(s: str) -> bool:
    v = s.strip().lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(
        f"expected a boolean (true/false/1/0/yes/no/on/off), got {s!r}")


def flag_value(args, name, default):
    """Last occurrence of `--name VALUE` or `--name=VALUE` in an arg list —
    the pre-parse peek used by CLIs whose config CLASS depends on a flag
    (sweep's --entry passthrough, export_model's --entry).  `args=None`
    reads sys.argv[1:]."""
    import sys

    args = sys.argv[1:] if args is None else args
    out = default
    for i, a in enumerate(args):
        if a == f"--{name}" and i + 1 < len(args):
            out = args[i + 1]
        elif a.startswith(f"--{name}="):
            out = a.split("=", 1)[1]
    return out


def resolve_pallas_stem(cfg) -> bool | None:
    """--pallas_stem auto|on|off -> None|True|False (auto = on-TPU only)."""
    v = str(getattr(cfg, "pallas_stem", "auto")).strip().lower()
    try:
        return {"auto": None, "on": True, "off": False}[v]
    except KeyError:
        raise SystemExit(
            f"--pallas_stem must be auto, on or off (got {v!r})")


# fields never inherited through --from_run: run-identity/resume knobs and
# operational sizes whose training-time values are wrong for a new
# invocation (e.g. the training batch size would silently cap the serving
# daemon's compiled batch)
_FROM_RUN_EXCLUDE = frozenset({
    "path_to_checkpoint", "resume_training", "run_name", "saving_dir",
    "profile_dir", "epoch_num", "batch_size", "num_threads", "log_console"})


def parse_config(cls, argv=None, **overrides):
    import sys

    # allow_abbrev=False: --from_run detects explicitly-passed flags by
    # their argv tokens, which only works if argparse never silently
    # expands a prefix ("--batch" must not mean batch_size)
    parser = argparse.ArgumentParser(description=cls.__doc__,
                                     allow_abbrev=False)
    parser.add_argument(
        "--from_run", default="",
        help="run directory (or checkpoint path inside one): inherit the "
             "run's saved config.json for every field not explicitly "
             "passed — predict/evaluate/serve without re-matching "
             "architecture flags by hand")
    for f in dataclasses.fields(cls):
        default = overrides.get(f.name, f.default)
        arg = f"--{f.name}"
        if f.type in (bool, "bool") or isinstance(default, bool):
            # bare flag toggles the default; an explicit true/false value
            # sets it ("--video_freeze false" fine-tunes the Swin tower)
            parser.add_argument(
                arg, nargs="?", const=not default, default=default,
                type=_parse_bool)
        else:
            typ = type(default) if default is not None else str
            parser.add_argument(arg, type=typ, default=default)
    ns = parser.parse_args(argv)
    kwargs = vars(ns)
    from_run = kwargs.pop("from_run")
    if from_run:
        explicit = {a.split("=", 1)[0].lstrip("-")
                    for a in (sys.argv[1:] if argv is None else argv)
                    if a.startswith("--")}
        saved = load_run_config(from_run)
        names = {f.name for f in dataclasses.fields(cls)}
        for k, v in saved.items():
            if (k in names and k not in explicit
                    and k not in _FROM_RUN_EXCLUDE):
                kwargs[k] = v
    return cls(**kwargs)


def save_run_config(cfg, run_dir: str):
    """Persist the resolved config next to the logs/checkpoints so later
    predict/evaluate/serve invocations can --from_run it (the reference's
    experiment identity was an unrecorded model_name string plus in-file
    edits, reference §5.6)."""
    import json

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({"config_class": type(cfg).__name__,
                   **dataclasses.asdict(cfg)}, f, indent=1, default=str)


def load_run_config(path: str) -> dict:
    import json

    for candidate in (path, os.path.dirname(path.rstrip("/"))):
        cfg_path = os.path.join(candidate, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                saved = json.load(f)
            saved.pop("config_class", None)
            return saved
    raise FileNotFoundError(
        f"no config.json under {path!r} (or its parent); --from_run needs "
        "a run directory produced by a train CLI")


def ensure_dataset(cfg: TrainConfig, **synth_kwargs):
    """Generate the synthetic AVABOS tree when requested/missing."""
    import pandas as pd

    csv = os.path.join(cfg.dataset_root, "time_intervals.csv")
    if cfg.synthetic and not os.path.exists(csv):
        from ..data.synthetic import generate_synthetic_avabos

        generate_synthetic_avabos(cfg.dataset_root, **synth_kwargs)
    if not os.path.exists(csv):
        raise FileNotFoundError(
            f"{csv} not found; pass --synthetic to generate a fixture")
    from ..data.avabos import load_cluster_split

    df = pd.read_csv(csv)
    split = load_cluster_split(
        os.path.join(cfg.dataset_root, "train_test_split.json"))
    return df, split


def make_optimizer(cfg: TrainConfig):
    """Optimizer chain: [clip] -> Adam/AdamW(schedule) -> [accumulation].

    Defaults reproduce the reference's plain Adam (trainer.py:370-373; its
    live scripts used no schedule/clipping).  The extra knobs are standard
    production-training levers the reference lacked: linear warmup joined to
    any schedule, global-norm clipping, decoupled weight decay, and
    gradient accumulation via optax.MultiSteps (an optimizer update every
    `grad_accum_steps` micro-batches — large effective batches without the
    activation memory)."""
    import optax

    if cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.lr_decay_steps)
    elif cfg.lr_schedule == "exponential":
        lr = optax.exponential_decay(cfg.learning_rate, cfg.lr_decay_steps,
                                     cfg.lr_decay_rate)
    else:
        # plain float, NOT constant_schedule: a schedule changes the
        # opt_state pytree (adds a count leaf), which would break checkpoint
        # restore against plain-Adam templates and pre-existing checkpoints
        lr = cfg.learning_rate
    if cfg.warmup_steps > 0:
        tail = (lr if callable(lr) else optax.constant_schedule(lr))
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
             tail], [cfg.warmup_steps])
    if cfg.weight_decay > 0:
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    else:
        tx = optax.adam(lr)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def apply_runtime_config(cfg: TrainConfig):
    """Process-level runtime knobs from the config (compilation cache)."""
    if getattr(cfg, "compilation_cache_dir", ""):
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(cfg.compilation_cache_dir)


def make_parallelism(cfg):
    """(batch sharding, TrainState placement hook) for this config's
    parallelism — (None, None) when neither --model_parallelism nor
    --data_parallel is set (single-device / externally-managed, unchanged
    behavior)."""
    tp = int(getattr(cfg, "model_parallelism", 1))
    dp_only = bool(getattr(cfg, "data_parallel", False)) and tp <= 1
    if tp <= 1 and not dp_only:
        return None, None
    import jax

    from ..parallel import data_sharding, make_mesh, replicated_sharding
    from ..parallel.sharding_rules import place_state_for_tp

    n = len(jax.devices())
    if tp > 1 and n % tp != 0:
        raise SystemExit(
            f"--model_parallelism {tp} does not divide the {n} available "
            "devices")
    dp = n // max(tp, 1)
    if cfg.batch_size % dp != 0:
        raise SystemExit(
            f"--batch_size {cfg.batch_size} must be divisible by the data "
            f"axis ({n} devices / tp {max(tp, 1)} = {dp})")
    if dp_only:
        mesh = make_mesh(jax.devices(), data_axis="data")
        repl = replicated_sharding(mesh)
        return (data_sharding(mesh),
                lambda state: jax.device_put(state, repl))
    mesh = make_mesh(jax.devices(), data_axis="data", model_axis="model",
                     model_parallelism=tp)
    return (data_sharding(mesh),
            lambda state: place_state_for_tp(state, mesh))


def build_trainer(cfg: TrainConfig, model, loss_specs, train_loader,
                  test_loader, num_classes=2, on_epoch_start=None):
    from ..train import Trainer

    apply_runtime_config(cfg)

    sharding, param_placement = make_parallelism(cfg)
    run_dir = (os.path.join(cfg.saving_dir, cfg.run_name)
               if getattr(cfg, "run_name", "") else None)
    trainer = Trainer(
        model, loss_specs, make_optimizer(cfg), train_loader,
        test_loader, num_classes=num_classes, saving_dir=cfg.saving_dir,
        run_dir=run_dir,
        model_name=cfg.model_name, checkpoint_criterion=cfg.checkpoint_criterion,
        seed=cfg.seed, log_console=cfg.log_console,
        on_epoch_start=on_epoch_start,
        compute_dtype=getattr(cfg, "compute_dtype", None),
        ema_decay=cfg.ema_decay,
        ema_update_every=cfg.grad_accum_steps,
        early_stop_patience=cfg.early_stop_patience,
        profile_dir=getattr(cfg, "profile_dir", "") or None,
        profile_epoch=getattr(cfg, "profile_epoch", 1),
        tensorboard_dir=getattr(cfg, "tensorboard_dir", "") or None,
        sharding=sharding, param_placement=param_placement)
    if trainer.is_main_process:
        save_run_config(cfg, trainer.run_dir)
    return trainer


def run_training(cfg: TrainConfig, trainer, train_loader):
    if cfg.resume_training and cfg.path_to_checkpoint:
        trainer.init_from_loader()
        trainer.load_checkpoint(cfg.path_to_checkpoint)
    elif getattr(cfg, "run_name", ""):
        # stable run dir: a relaunch after a crash or preemption resumes
        # from checkpoint_preempt/checkpoint_current automatically
        trainer.resume_latest()
    trainer.fit(cfg.epoch_num)
    trainer.plot_logs()
    return trainer
