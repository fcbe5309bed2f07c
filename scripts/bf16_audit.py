"""bf16 end-to-end deviation audit on trained weights (VERDICT r3 item 7).

The bf16 fast mode (706 fused / 835 SFA-only fps vs 684/?? f32,
docs/TECHNICAL.md) has never had its OUTPUT deviation quantified on trained
weights — the 1e-3 parity claim is measured in f32 only. This harness runs
the SFA3D detection pipeline over held-out frames in f32 and bf16 with the
SAME trained weights and reports:

- detection match rate (greedy BEV-center matching, same class),
- per-field deviation percentiles over matched pairs (x, y, z in meters,
  h/w/l in meters, yaw in radians, confidence),
- held-out mAP in both dtypes (the decision-relevant number: does the fast
  mode change WHAT is detected, not just the 7th decimal),
- the verdict: whether bf16 stays inside the 1e-3 detection tolerance
  (expected NO — bf16 carries ~3 significant digits — in which case the
  artifact documents the actual envelope and the AP delta instead).

Run:  python scripts/bf16_audit.py --dataset_dir <kitti> \
          --pretrained_path <ckpt> [--use_ema] [--cpu] [--out BF16_AUDIT.json]
"""

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def match_and_diff(real_a, scores_a, mask_a, real_b, scores_b, mask_b,
                   max_dist=1.0):
    """Greedy nearest-center matching between two detection sets of one
    frame (same class required). Returns list of per-field |delta| rows and
    counts (n_a, n_b, n_matched)."""
    import numpy as np

    A = real_a[mask_a]
    B = real_b[mask_b]
    sa = scores_a[mask_a]
    sb = scores_b[mask_b]
    used = np.zeros(len(B), bool)
    rows = []
    for i in range(len(A)):
        if not len(B):
            break
        d = np.linalg.norm(B[:, 1:3] - A[i, 1:3], axis=1)
        d = np.where(used | (B[:, 0] != A[i, 0]), np.inf, d)
        j = int(np.argmin(d))
        if d[j] > max_dist:
            continue
        used[j] = True
        dyaw = np.abs(np.mod(A[i, 7] - B[j, 7] + np.pi, 2 * np.pi) - np.pi)
        rows.append(np.abs(np.concatenate([
            A[i, 1:7] - B[j, 1:7], [dyaw], [sa[i] - sb[j]]
        ])))
    return rows, (len(A), len(B), len(rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--pretrained_path", required=True)
    ap.add_argument("--arch", default="fpn_resnet_18")
    ap.add_argument("--split", default="val")
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--K", type=int, default=50)
    ap.add_argument("--peak_thresh", type=float, default=0.2)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(_ROOT, "BF16_AUDIT.json"))
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from sfa3d_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.eval import evaluate_kitti_ap
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.pipeline import detect_frames

    model32 = create_model(args.arch)
    model16 = create_model(args.arch, dtype=jnp.bfloat16)
    variables = load_variables(args.pretrained_path, args.arch, model32,
                               use_ema=args.use_ema)
    dataset = KittiDataset(args.dataset_dir, mode=args.split, hflip_prob=0.0,
                           num_samples=args.num_samples)

    diffs, gts = [], []
    dets = {"f32": [], "bf16": []}
    counts = np.zeros(3, np.int64)
    for idx in range(len(dataset)):
        sample = dataset[idx]
        per_mode = {}
        for name, model in [("f32", model32), ("bf16", model16)]:
            out = detect_frames(model, variables, sample.points[None],
                                sample.valid[None], K=args.K,
                                peak_thresh=args.peak_thresh)
            per_mode[name] = (
                np.asarray(out["boxes_real"])[0],
                np.asarray(out["detections"])[0, :, 0],
                np.asarray(out["mask"])[0],
            )
            real, scores, mask = per_mode[name]
            dets[name].append({
                "boxes": real[mask][:, 1:8],
                "scores": scores[mask],
                "classes": real[mask][:, 0].astype(int),
            })
        rows, c = match_and_diff(*per_mode["f32"], *per_mode["bf16"])
        diffs.extend(rows)
        counts += c
        lab = sample.labels[: int(sample.n_labels)]
        gt = {"boxes": lab[:, 1:8], "classes": lab[:, 0].astype(int)}
        if sample.levels is not None:
            gt["difficulty"] = sample.levels[: int(sample.n_labels)]
        gts.append(gt)
        if (idx + 1) % 16 == 0:
            print(f"{idx + 1}/{len(dataset)} frames")

    D = np.asarray(diffs) if diffs else np.zeros((0, 8))
    fields = ["x_m", "y_m", "z_m", "h_m", "w_m", "l_m", "yaw_rad", "conf"]
    stats = {
        f: {
            "p50": round(float(np.percentile(D[:, i], 50)), 6),
            "p95": round(float(np.percentile(D[:, i], 95)), 6),
            "max": round(float(D[:, i].max()), 6),
        }
        for i, f in enumerate(fields)
    } if len(D) else {}

    ap32 = evaluate_kitti_ap(dets["f32"], gts, metric="3d")
    ap16 = evaluate_kitti_ap(dets["bf16"], gts, metric="3d")
    worst = max((s["max"] for s in stats.values()), default=float("inf"))
    within = bool(len(D)) and worst <= 1e-3 and counts[0] == counts[2] == counts[1]
    report = {
        "cmd": " ".join(["python", os.path.relpath(sys.argv[0], _ROOT)]
                        + sys.argv[1:]),
        "frames": len(dataset),
        "detections_f32": int(counts[0]),
        "detections_bf16": int(counts[1]),
        "matched_pairs": int(counts[2]),
        "per_field_abs_deviation": stats,
        "mAP_f32": round(ap32["mAP"], 4),
        "mAP_bf16": round(ap16["mAP"], 4),
        "delta_mAP": round(ap16["mAP"] - ap32["mAP"], 4),
        "within_1e3_tolerance": within,
        "verdict": (
            "bf16 matches f32 within the 1e-3 detection tolerance; eligible "
            "for the headline bench mode" if within else
            "bf16 deviates beyond the 1e-3 detection tolerance (expected: "
            "bf16 carries ~3 significant digits through the conv stack); "
            "the parity-claiming headline stays f32, bf16 remains the "
            "documented fast mode with the deviation envelope + AP delta "
            "recorded here"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("matched_pairs", "mAP_f32", "mAP_bf16",
                       "within_1e3_tolerance")}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
