"""Autoanchor clustering + plotting smoke tests."""

import numpy as np

from multispectral_object_detection_tpu.utils.autoanchor import (
    anchor_fitness, best_possible_recall, check_anchors, dataset_wh,
    kmean_anchors)


def _labels(n_imgs=20, rng=None):
    rng = rng or np.random.default_rng(0)
    labels = []
    for _ in range(n_imgs):
        k = rng.integers(1, 6)
        l = np.zeros((k, 5), dtype=np.float32)
        l[:, 0] = rng.integers(0, 3, k)
        l[:, 1:3] = rng.uniform(0.2, 0.8, (k, 2))
        l[:, 3:5] = rng.uniform(0.05, 0.4, (k, 2))
        labels.append(l)
    return labels


def test_bpr_perfect_anchors():
    wh = np.array([[10.0, 10.0], [50.0, 50.0]])
    anchors = wh.copy()
    bpr, _ = best_possible_recall(anchors, wh)
    assert bpr == 1.0
    assert anchor_fitness(anchors, wh) == 1.0


def test_kmeans_improves_random_anchors():
    rng = np.random.default_rng(1)
    wh = np.concatenate([
        rng.normal([20, 20], 2, (200, 2)),
        rng.normal([80, 40], 5, (200, 2)),
        rng.normal([200, 180], 10, (200, 2)),
    ]).clip(3)
    bad = np.array([[3.0, 3.0], [4.0, 4.0], [5.0, 5.0]])
    new = kmean_anchors(wh, n=3, gen=200, seed=0)
    assert anchor_fitness(new, wh) > anchor_fitness(bad, wh)
    # clusters should approximate the three modes (sorted by area)
    assert abs(new[0].mean() - 20) < 8
    assert abs(new[2].prod() - 200 * 180) / (200 * 180) < 0.4


def test_check_anchors_keeps_good():
    labels = _labels()
    wh = dataset_wh(labels, 640)
    good = kmean_anchors(wh, n=9, gen=100, seed=0).reshape(3, 3, 2)
    out = check_anchors(labels, good, 640)
    np.testing.assert_array_equal(out, good)


def test_check_anchors_fixes_bad():
    labels = _labels()
    bad = (np.ones((3, 3, 2)) * [[1.5, 1.5]]).astype(np.float32)
    bad = bad.reshape(3, 3, 2)
    out = check_anchors(labels, bad, 640)
    wh = dataset_wh(labels, 640)
    assert anchor_fitness(out.reshape(-1, 2), wh) > \
        anchor_fitness(bad.reshape(-1, 2), wh)


def test_plots_smoke(tmp_path):
    from multispectral_object_detection_tpu.utils.plots import (
        plot_batch, plot_confusion_matrix, plot_labels, plot_pr_curve)

    labels = _labels(5)
    plot_labels(labels, ["a", "b", "c"], str(tmp_path))
    assert (tmp_path / "labels.png").exists()

    imgs = np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3),
                                             dtype=np.uint8)
    targets = np.array([[0, 0, 0.5, 0.5, 0.3, 0.3],
                        [1, 1, 0.4, 0.6, 0.2, 0.2]], dtype=np.float32)
    plot_batch(imgs, targets, np.ones(2), str(tmp_path / "b.jpg"), ["a", "b"])
    assert (tmp_path / "b.jpg").exists()

    px = np.linspace(0, 1, 50)
    plot_pr_curve(px, [1 - px, 1 - px**2], np.array([[0.5], [0.7]]),
                  str(tmp_path / "pr.png"), ["a", "b"])
    assert (tmp_path / "pr.png").exists()

    plot_confusion_matrix(np.array([[5, 1, 0], [0, 4, 1], [1, 0, 3]]),
                          ["a", "b"], str(tmp_path / "cm.png"))
    assert (tmp_path / "cm.png").exists()

def test_plots_tail_smoke(tmp_path):
    """Round-3 plot tail: LR schedule, evolution scatter, study trade-off,
    label correlogram, metric-confidence curves (reference plots.py:206,
    253, 333; metrics.py plot_mc_curve)."""
    import numpy as np

    from multispectral_object_detection_tpu.train.optim import OptHyp
    from multispectral_object_detection_tpu.utils.plots import (
        plot_evolution, plot_label_correlogram, plot_lr_schedule,
        plot_mc_curve, plot_study)

    plot_lr_schedule(OptHyp(), steps_per_epoch=20, epochs=5,
                     total_batch_size=16, save_dir=str(tmp_path))
    assert (tmp_path / "LR.png").exists()

    keys = ["lr0", "momentum", "box"]
    rows = np.column_stack([np.random.default_rng(0).random((6, 1)),
                            np.random.default_rng(1).random((6, 3))])
    np.savetxt(tmp_path / "evolve.txt", rows)
    plot_evolution(str(tmp_path / "evolve.txt"), keys,
                   str(tmp_path / "evolve.png"))
    assert (tmp_path / "evolve.png").exists()

    study = np.array([[256, .5, .6, .55, .35, 3.0, 0.4],
                      [512, .6, .7, .68, .45, 7.0, 0.4]])
    np.savetxt(tmp_path / "study_x.txt", study, fmt="%.5g")
    plot_study([str(tmp_path / "study_x.txt")], str(tmp_path / "study.png"))
    assert (tmp_path / "study.png").exists()

    labels = _labels(4)
    plot_label_correlogram(labels, str(tmp_path))
    assert (tmp_path / "labels_correlogram.jpg").exists()

    px = np.linspace(0, 1, 40)
    plot_mc_curve(px, np.stack([1 - px, (1 - px) ** 2]),
                  str(tmp_path / "F1.png"), ["a", "b"], ylabel="F1")
    assert (tmp_path / "F1.png").exists()
