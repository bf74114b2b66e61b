"""HTTP micro-batching inference server for trained multimodal checkpoints.

The reference stops at training scripts (train_multimodal.py etc.); this is
the online serving story on top of them: one process loads a checkpoint,
compiles a fixed-batch `serve.Predictor` once, and scores concurrent HTTP
requests through a `serve.MicroBatcher` — whatever arrives within
--max_delay_ms is coalesced into ONE padded TPU dispatch, so p50 stays near
single-clip latency (~0.35 ms device time, results_v5e.json) while sustained
throughput under load approaches the full-batch number.

  python -m multimodalaggressionrecognition_tpu.cli.serve \
      --path_to_checkpoint runs/<run>/checkpoint_best_verb \
      --modalities audio,text --port 8000

Protocol:
  GET  /healthz -> {"ok": true, "models": {name: {modalities, heads,
                    batch_size}}} (+ flat legacy fields when one model)
  GET  /statz   -> per-model operational counters: requests, clips,
                    device dispatches, achieved coalescing factor
                    (clips/dispatches), recent-latency p50/p99
  POST /score   -> {"phys": [[p_neg, p_aggr], ...], "verb": ...}
  POST /score/<name> -> same, selecting one of several co-resident models
      (multi-model serving via --exported a=dir1,b=dir2 — int8 artifacts
      make this a density play: many models per chip)
      Body is JSON ({"audio": clip-or-batch, "text": ...}) or an np.savez
      archive with Content-Type application/x-npz (the efficient path for
      waveform/video payloads).  A clip is audio (L,), text (T, H), video
      (T, H, W, C); a leading batch dim is accepted, and variable lengths
      are padded/truncated to the compiled sizes exactly like training
      (data/transforms.py).  Every request must carry the server's full
      modality set — one compiled presence pattern, the same invariant
      AggrBatchSampler keeps in training; batches larger than the compiled
      size are chunked across micro-batch groups server-side.
"""

import io
import json
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .common import parse_config
from .train_multimodal import MultimodalConfig, build_model



@dataclass
class ServeConfig(MultimodalConfig):
    path_to_checkpoint: str = ""
    # serve jax.export artifacts (cli/export_model.py) instead of building
    # the model from config + checkpoint: no model code or weights load,
    # and every architecture/shape flag is read from the artifact's meta.
    #   --exported <dir>                      one model at POST /score
    #   --exported a=<dir1>,b=<dir2>          multi-model: POST /score/a,
    #       /score/b — co-resident models in one process/chip (int8
    #       artifacts make this a density play: ~4x smaller weights each)
    exported: str = ""
    host: str = "127.0.0.1"
    port: int = 8000
    batch_size: int = 32
    max_delay_ms: float = 2.0   # micro-batch coalescing window
    quantize: str = ""          # '', 'int8' (weight-only), 'w8a8' (int8 MXU)
    # shard each scoring batch across ALL local devices (data-parallel
    # serving over the slice's mesh; params replicated, jit inserts the
    # collectives) — serve.Predictor(sharding=...)
    data_parallel: bool = False
    # explicit opt-in for serving untrained weights (smoke tests only);
    # without it a missing --path_to_checkpoint is an error, never a
    # healthy-looking server scoring garbage
    allow_random_weights: bool = False


@dataclass
class _Endpoint:
    """One served model: its batcher plus everything the handler needs."""

    name: str
    predictor: object
    batcher: object
    modalities: set
    pads: dict
    ndims: dict  # modality -> expected single-clip ndim (artifact-derived)
    batch_size: int
    heads: list

    def __post_init__(self):
        import threading
        from collections import deque

        # wall-clock ms per completed /score request (bounded window;
        # deque.append is GIL-atomic so handler threads need no lock).
        # `requests += 1` is a read-modify-write and DOES need the lock —
        # concurrent handlers would lose increments.
        self.latencies = deque(maxlen=2048)
        self.requests = 0
        self.count_lock = threading.Lock()

    def info(self):
        return {"modalities": sorted(self.modalities),
                "heads": sorted(self.heads),
                "batch_size": self.batch_size}

    def stats(self):
        """Operational counters for /statz: request/clip/dispatch totals,
        achieved coalescing factor, and recent latency percentiles."""
        out = {"requests": self.requests, **self.batcher.stats}
        if out["dispatches"]:
            out["mean_group_size"] = round(
                out["clips"] / out["dispatches"], 2)
        lat = sorted(self.latencies)
        if lat:
            out["recent_latency_ms"] = {
                "p50": round(lat[len(lat) // 2], 2),
                "p99": round(lat[min(int(len(lat) * 0.99),
                                     len(lat) - 1)], 2),
                "window": len(lat)}
        return out


def _as_batch(name: str, value, pad, nd: int) -> np.ndarray:
    """Normalize a request value to a padded (n, ...) float32 batch."""
    try:
        arr = np.asarray(value, dtype=np.float32)
    except (ValueError, TypeError):
        # ragged JSON batch: variable-length clips, pad each
        return np.stack([pad(np.asarray(c, np.float32)) for c in value])
    if arr.ndim == nd:
        return pad(arr)[None]
    if arr.ndim == nd + 1:
        return np.stack([pad(c) for c in arr])
    raise ValueError(f"{name}: expected a {nd}-d clip or {nd + 1}-d batch, "
                     f"got {arr.ndim}-d")


class _Handler(BaseHTTPRequestHandler):
    # the server object carries batcher/pads/modalities (see build_server)
    timeout = 60  # bound a stalled client so shutdown's join can't hang

    def log_message(self, fmt, *args):  # quiet access log
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _endpoint(self):
        """Resolve /score (sole model) or /score/<name> to an endpoint."""
        endpoints = self.server.endpoints
        if self.path == "/score":
            if len(endpoints) == 1:
                return next(iter(endpoints.values()))
            raise LookupError(
                f"this server hosts multiple models {sorted(endpoints)}; "
                "POST /score/<name>")
        if self.path.startswith("/score/"):
            name = self.path[len("/score/"):]
            if name in endpoints:
                return endpoints[name]
            raise LookupError(
                f"unknown model {name!r}; served: {sorted(endpoints)}")
        raise LookupError(f"unknown path {self.path!r}")

    def do_GET(self):
        srv = self.server
        if self.path == "/healthz":
            payload = {"ok": True,
                       "models": {name: ep.info()
                                  for name, ep in srv.endpoints.items()}}
            if len(srv.endpoints) == 1:
                # single-model servers keep the flat legacy fields
                payload.update(next(iter(srv.endpoints.values())).info())
            self._reply(200, payload)
        elif self.path == "/statz":
            self._reply(200, {name: ep.stats()
                              for name, ep in srv.endpoints.items()})
        else:
            self._reply(404, {"error": f"unknown path {self.path!r}"})

    def do_POST(self):
        try:
            ep = self._endpoint()
        except LookupError as e:
            return self._reply(404, {"error": str(e)})
        try:
            raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if self.headers.get("Content-Type", "").startswith(
                    "application/x-npz"):
                request = dict(np.load(io.BytesIO(raw)))
            else:
                request = json.loads(raw)
            if set(request) != ep.modalities:
                raise ValueError(
                    f"request modalities {sorted(request)} != served set "
                    f"{sorted(ep.modalities)} (one compiled presence "
                    "pattern; start the server with --modalities to change)")
            batch = {m: _as_batch(m, v, ep.pads[m], ep.ndims[m])
                     for m, v in request.items()}
            sizes = {m: a.shape[0] for m, a in batch.items()}
            n = next(iter(sizes.values()))
            if any(s != n for s in sizes.values()):
                raise ValueError(f"modalities disagree on batch size: {sizes}")
        except Exception as e:  # malformed request: the caller's fault
            return self._reply(400, {"error": str(e)})
        try:
            t0 = time.monotonic()
            # chunk oversized batches across micro-batch groups; submit all
            # chunks before waiting so they pipeline through the batcher
            futs = [ep.batcher.submit(
                {m: a[s:s + ep.batch_size] for m, a in batch.items()})
                for s in range(0, n, ep.batch_size)]
            scores = [f.result() for f in futs]
            out = {h: np.concatenate([s[h] for s in scores]).round(4).tolist()
                   for h in scores[0]}
            with ep.count_lock:
                ep.requests += 1
            ep.latencies.append((time.monotonic() - t0) * 1e3)
            self._reply(200, out)
        except Exception as e:
            self._reply(500, {"error": str(e)})


def build_server(cfg: ServeConfig, variables=None) -> ThreadingHTTPServer:
    """Construct the HTTP server (not yet serving): loads/initializes the
    model, compiles + warms the Predictor, and starts the MicroBatcher.
    Pass `variables` to skip checkpoint restore (tests)."""
    import jax

    from ..data.transforms import pad_audio, pad_text, pad_video
    from ..io import checkpoint as ckpt_io
    from ..serve import MicroBatcher, Predictor
    from .common import apply_runtime_config

    apply_runtime_config(cfg)  # --compilation_cache_dir

    sharding = None
    placement = None
    tp = int(getattr(cfg, "model_parallelism", 1))
    if tp > 1:
        # dp x tp serving: batches shard on `data`, transformer kernels
        # Megatron-shard on `model` (inherited TrainConfig flag)
        from ..parallel.mesh import data_sharding, make_mesh
        from ..parallel.sharding_rules import place_params

        n = len(jax.devices())
        if n % tp != 0:
            raise SystemExit(f"--model_parallelism {tp} does not divide "
                             f"the {n} available devices")
        mesh = make_mesh(jax.devices(), data_axis="data",
                         model_axis="model", model_parallelism=tp)
        sharding = data_sharding(mesh)
        placement = lambda p: place_params(p, mesh)
    elif getattr(cfg, "data_parallel", False):
        from ..parallel.mesh import data_sharding, make_mesh

        sharding = data_sharding(make_mesh(jax.devices()))

    pad_builders = {"audio": pad_audio, "text": pad_text, "video": pad_video}

    def _make_endpoint(name, predictor, shapes, heads, batch_size):
        # pad/truncate each served modality to the compiled clip length
        # (the leading dim of its clip shape) — from the artifact meta when
        # serving an export, from the config otherwise.  Expected clip
        # ndims come from the shapes too, so feature-sequence artifacts
        # (e.g. train_video_rnn's (T, D) "video") validate correctly.
        return _Endpoint(
            name=name, predictor=predictor,
            batcher=MicroBatcher(predictor, max_delay_ms=cfg.max_delay_ms),
            modalities=set(shapes),
            pads={m: pad_builders[m](shapes[m][0]) for m in shapes},
            ndims={m: len(shapes[m]) for m in shapes},
            batch_size=batch_size, heads=heads)

    endpoints = {}
    if getattr(cfg, "exported", ""):
        # code-free path: each artifact carries its compiled forward with
        # weights baked in, plus every shape the handler needs.  Multiple
        # `name=dir` entries co-reside in one process (POST /score/<name>).
        from ..io.export import ExportedPredictor

        if cfg.path_to_checkpoint or cfg.quantize:
            raise SystemExit(
                "--exported conflicts with --path_to_checkpoint/--quantize:"
                " the artifact's weights (and any int8 quantization) were "
                "baked in at export time — re-export to change them")
        entries = [e for e in cfg.exported.split(",") if e]
        if any("=" in e for e in entries):
            if not all("=" in e for e in entries):
                raise SystemExit(
                    "--exported: mixing named (name=dir) and unnamed "
                    "entries is ambiguous — name all of them")
            pairs = [e.split("=", 1) for e in entries]
            named = dict(pairs)
            if len(named) != len(pairs):
                # a duplicate name (blue/green typo) would silently serve
                # only the LAST entry while the operator believes both live
                dupes = sorted({n for n, _ in pairs
                                if sum(1 for m, _ in pairs if m == n) > 1})
                raise SystemExit(f"--exported: duplicate model names "
                                 f"{dupes} — each name maps to one artifact")
        elif len(entries) == 1:
            named = {"model": entries[0]}
        else:
            raise SystemExit(
                "--exported: multiple artifacts need names (a=dir1,b=dir2)")
        for name, path in named.items():
            pred = ExportedPredictor(path, sharding=sharding).warmup()
            endpoints[name] = _make_endpoint(
                name, pred, dict(pred.clip_shapes), pred.heads,
                pred.batch_size)
    else:
        from .common import clip_shapes_from_config

        modalities = tuple(sorted(cfg.modalities.split(",")))
        model = build_model(cfg, modalities)

        shapes = clip_shapes_from_config(cfg, modalities)
        example = {m: np.zeros((1,) + shapes[m], np.float32)
                   for m in modalities}
        if variables is None:
            if cfg.path_to_checkpoint:
                # template-free inference restore: EMA shadow when tracked,
                # independent of the training optimizer structure
                variables, _ = ckpt_io.restore_variables(
                    cfg.path_to_checkpoint)
            elif cfg.allow_random_weights:
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(cfg.seed),
                    {m: {"data": v, "present": np.ones((1,), np.float32)}
                     for m, v in example.items()})
            else:
                raise SystemExit(
                    "--path_to_checkpoint is required: serving freshly "
                    "initialized weights produces garbage scores behind a "
                    "healthy-looking endpoint (pass --allow_random_weights "
                    "true for smoke tests)")

        predictor = Predictor(model, variables, batch_size=cfg.batch_size,
                              compute_dtype=getattr(cfg, "compute_dtype",
                                                    None),
                              quantize=cfg.quantize or None,
                              sharding=sharding, param_placement=placement)
        predictor.warmup(example)
        endpoints["model"] = _make_endpoint(
            "model", predictor, shapes, predictor.heads, cfg.batch_size)

    server = ThreadingHTTPServer((cfg.host, cfg.port), _Handler)
    # NON-daemon handler threads: socketserver only tracks+joins non-daemon
    # handlers in server_close(), and the drain contract needs that join —
    # with daemon threads, interpreter exit could kill a handler between
    # its future resolving and the response write.  server_close() joins
    # the handlers BEFORE the batchers close (see main): in-flight handlers
    # can still submit() and their futures resolve because the batcher
    # threads are alive; _Handler.timeout bounds a stalled client so the
    # join cannot hang.
    server.daemon_threads = False
    server.endpoints = endpoints
    if len(endpoints) == 1:
        # flat aliases for the common single-model case (tests, embedding)
        ep = next(iter(endpoints.values()))
        server.predictor = ep.predictor
        server.batcher = ep.batcher
        server.batch_size = ep.batch_size
        server.modalities = ep.modalities
        server.heads = ep.heads
        server.pads = ep.pads
    return server


def main(argv=None):
    import signal
    import threading

    cfg = parse_config(ServeConfig, argv)
    server = build_server(cfg)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "models": {name: ep.info()
                                 for name, ep in server.endpoints.items()}}),
          flush=True)

    # graceful drain on SIGTERM: stop accepting, finish in-flight scoring,
    # exit 0 — the serving counterpart of the trainer's preemption handling
    def _drain(signum, frame):
        print(json.dumps({"draining": signum}), flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _drain)
    except ValueError:  # not the main thread (tests drive serve_forever)
        pass
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # join in-flight handler threads FIRST — a handler that accepted a
        # request but hasn't submit()ed yet must still reach the (alive)
        # batcher, not get a 500 "MicroBatcher is closed" mid-drain
        server.server_close()
        for ep in server.endpoints.values():
            ep.batcher.close()  # then drain anything still queued


if __name__ == "__main__":
    main()
