"""Production inference engine: images in, detections out.

The reference has no serving path — inference lives in a dev notebook
(reference notebooks/dev-model.ipynb: safetensors load -> forward ->
PostProcess).  This engine packages that flow TPU-natively for deployment:

  * **Fixed-shape compilation**: incoming images are val-transformed
    (shortest side 800 / max 1333, reference detr/data.py:66-83) and grouped
    into the aspect-ratio buckets the jitted predict function was compiled
    for — so serving traffic never triggers a recompile, whatever the mix of
    image sizes.
  * **One fused device program** per bucket shape: forward (last decoder
    layer) + box decode + score/label reduction run in a single jit; only
    (B, Q)-sized results come back to the host.
  * **Static batching**: requests are padded to the engine's batch size with
    the last image repeated; padded rows are dropped on the host side.
    (Continuous batching is a scheduler concern — this engine is the
    per-chip executor a request router would drive.)

Checkpoints: either pass ``variables`` (a ``{"params": ..., "frozen": ...}``
tree) or ``checkpoint_dir`` (the trainer's orbax output —
detr_tpu/train/checkpoint.py) to load the latest step's weights.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from detr_tpu.config import DETRConfig
from detr_tpu.data.bucketing import EVAL_BUCKETS, fit_to_bucket, pick_bucket
from detr_tpu.data.transforms import ValTransform
from detr_tpu.eval.postprocess import postprocess_predictions
from detr_tpu.models import DETR

Array = jax.Array


class InferenceEngine:
    """Single-host DETR serving executor.

    Args:
      config: model hyperparameters (must match the checkpoint).
      variables: {"params", "frozen"} tree; omit to random-init (testing).
      checkpoint_dir: trainer output dir to restore the latest weights from
        (mutually exclusive with ``variables``).
      class_names: index -> label strings for the response dicts.
      batch_size: device batch per bucket (requests are padded up to this).
      buckets: compiled (H, W) shapes; defaults to the eval buckets.
      score_threshold: detections below this confidence are dropped.
    """

    def __init__(
        self,
        config: DETRConfig,
        variables: Optional[dict] = None,
        checkpoint_dir: Optional[str] = None,
        class_names: Optional[Sequence[str]] = None,
        batch_size: int = 8,
        buckets: Sequence[tuple[int, int]] = EVAL_BUCKETS,
        score_threshold: float = 0.0,
        min_size: int = 800,
        max_size: int = 1333,
    ):
        if variables is not None and checkpoint_dir is not None:
            raise ValueError("pass either variables or checkpoint_dir, not both")
        self.config = config
        self.model = DETR(config)
        self.batch_size = int(batch_size)
        self.buckets = tuple(tuple(b) for b in buckets)
        self.score_threshold = float(score_threshold)
        self.class_names = list(class_names) if class_names is not None else None
        self.transform = ValTransform(min_size=min_size, max_size=max_size)

        if variables is None:
            init_rng = jax.random.PRNGKey(0)
            h, w = self.buckets[0]
            variables = self.model.init(
                init_rng,
                jnp.zeros((1, h, w, 3), jnp.float32),
                jnp.array([h], jnp.int32),
                jnp.array([w], jnp.int32),
            )
            if checkpoint_dir is not None:
                variables = self._restore(checkpoint_dir, variables)
        self._params = variables["params"]
        self._frozen = variables.get("frozen", {})

        @jax.jit
        def _predict(params, frozen, images, heights, widths, orig_h, orig_w):
            out = self.model.apply(
                {"params": params, "frozen": frozen}, images, heights, widths
            )
            # Last decoder layer only (reference detr/train.py:401-406).
            return postprocess_predictions(
                out["pred_logits"][:, -1], out["pred_boxes"][:, -1], orig_h, orig_w
            )

        self._predict = _predict

    def _restore(self, checkpoint_dir: str, template: dict) -> dict:
        from detr_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        try:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
            payload = mgr.restore_payload(step)
            return {
                "params": payload["params"],
                "frozen": payload.get("frozen", template.get("frozen", {})),
            }
        finally:
            mgr.close()

    def warmup(self) -> None:
        """Compile every (bucket x batch) program ahead of traffic."""
        for h, w in self.buckets:
            imgs = np.zeros((self.batch_size, h, w, 3), np.float32)
            ext = np.full((self.batch_size,), h, np.int32)
            wid = np.full((self.batch_size,), w, np.int32)
            out = self._predict(
                self._params, self._frozen, jnp.asarray(imgs), jnp.asarray(ext),
                jnp.asarray(wid), jnp.asarray(ext), jnp.asarray(wid)
            )
            jax.tree.map(lambda x: x.block_until_ready(), out)

    def predict(self, images: Sequence) -> list[dict]:
        """Detect objects in each image (ndarray HWC uint8/float or PIL).

        Returns one dict per input, in input order:
        {scores (N,), labels (N,), boxes (N, 4) XYXY in ORIGINAL pixel
        coords, class_names (N,) when the engine has labels}.
        """
        prepped = []  # (orig_idx, bucket_id, img, valid_h, valid_w, oh, ow)
        for idx, img in enumerate(images):
            arr = np.asarray(img)
            if arr.dtype.kind == "f" and arr.size:
                # The normalize path assumes 0-255 pixel scale; a [0, 1]
                # float image would normalize to ~-2 everywhere and return
                # confident nonsense with no error.  Only max in (0, 1] is
                # treated as [0, 1]-scale: an all-zero frame is identical on
                # both scales, and a genuinely dark 0-255 image (max in
                # (1, 255]) must stay servable — a camera feed's black
                # frames are legitimate requests, not client bugs.
                mx = float(arr.max())
                if 0.0 < mx <= 1.0:
                    raise ValueError(
                        "float images must be on the 0-255 scale (got max "
                        f"{mx:.3f}); multiply by 255 or pass uint8"
                    )
            oh, ow = arr.shape[:2]
            timg, _ = self.transform(arr, _empty_target())
            bucket_id = pick_bucket(timg.shape[0], timg.shape[1], self.buckets)
            timg, _ = fit_to_bucket(timg, _empty_target(), self.buckets[bucket_id])
            prepped.append((idx, bucket_id, timg, oh, ow))

        results: list[Optional[dict]] = [None] * len(images)
        by_bucket: dict[int, list] = {}
        for item in prepped:
            by_bucket.setdefault(item[1], []).append(item)

        for bucket_id, items in by_bucket.items():
            bh, bw = self.buckets[bucket_id]
            for start in range(0, len(items), self.batch_size):
                chunk = items[start : start + self.batch_size]
                n = len(chunk)
                pad = self.batch_size - n
                chunk = chunk + [chunk[-1]] * pad
                imgs = np.zeros((self.batch_size, bh, bw, 3), np.float32)
                hs = np.zeros((self.batch_size,), np.int32)
                ws = np.zeros((self.batch_size,), np.int32)
                ohs = np.zeros((self.batch_size,), np.int32)
                ows = np.zeros((self.batch_size,), np.int32)
                for b, (_, _, timg, oh, ow) in enumerate(chunk):
                    th, tw = timg.shape[:2]
                    imgs[b, :th, :tw] = timg
                    hs[b], ws[b] = th, tw
                    ohs[b], ows[b] = oh, ow
                out = self._predict(
                    self._params,
                    self._frozen,
                    jnp.asarray(imgs),
                    jnp.asarray(hs),
                    jnp.asarray(ws),
                    jnp.asarray(ohs),
                    jnp.asarray(ows),
                )
                scores = np.asarray(out["scores"])[:n]
                labels = np.asarray(out["labels"])[:n]
                boxes = np.asarray(out["boxes"])[:n]
                for b, (idx, _, _, _, _) in enumerate(chunk[:n]):
                    keep = scores[b] >= self.score_threshold
                    det = {
                        "scores": scores[b][keep],
                        "labels": labels[b][keep],
                        "boxes": boxes[b][keep],
                    }
                    if self.class_names is not None:
                        det["class_names"] = [
                            self.class_names[i] for i in det["labels"]
                        ]
                    results[idx] = det
        return results  # type: ignore[return-value]


def _empty_target() -> dict:
    return {
        "boxes": np.zeros((0, 4), np.float32),
        "class_idx": np.zeros((0,), np.int32),
        "class_id": np.zeros((0,), np.int32),
        "iscrowd": np.zeros((0,), bool),
    }
