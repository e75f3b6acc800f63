"""Matrix + dendrogram plotting (parity: reference `src/sourmash/fig.py`,
plot_composite_matrix:26)."""

from __future__ import annotations

from .logging import error, notify

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as pylab
    import numpy
    import scipy.cluster.hierarchy as sch
except ImportError:  # pragma: no cover
    pylab = None

# composite-figure geometry: dendrogram at left, matrix centered (shifted
# left when labels are hidden), colorbar just right of the matrix
_DENDRO_AXES = [0.09, 0.1, 0.2, 0.6]
_MATRIX_WIDTH = 0.45
_MATRIX_X = {True: 0.45, False: 0.315}  # keyed by show_labels


def load_matrix_and_labels(basefile):
    "Load the comparison matrix and associated labels, return (D, labels)."
    import numpy

    with open(basefile, "rb") as fp:
        D = numpy.load(fp)
    with open(basefile + ".labels.txt") as fp:
        labeltext = [x.strip() for x in fp]
    return (D, labeltext)


def _coerce_to_distance(D, force):
    "Require values in [0, 1], rescaling only under --force."
    if D.max() > 1.0 or D.min() < 0.0:
        error(
            "This matrix doesn't look like a distance matrix - min value {}, max value {}",
            D.min(),
            D.max(),
        )
        if not force:
            raise ValueError("not a distance matrix")
        notify("force is set; scaling to [0, 1]")
        D -= D.min()
        D /= D.max()
    return D


def plot_composite_matrix(
    D, labeltext, show_labels=True, vmax=1.0, vmin=0.0, force=False
):
    """Build a composite plot: dendrogram + distance matrix/heatmap.

    Returns a matplotlib figure, plus reordered labels and matrix."""
    D = _coerce_to_distance(D, force)

    if not show_labels:
        labeltext = [""] * len(labeltext)

    fig = pylab.figure(figsize=(11, 8))
    ax1 = fig.add_axes(_DENDRO_AXES)

    # plot dendrogram
    Y = sch.linkage(D, method="single")

    dendrolabels = labeltext
    if not show_labels:
        dendrolabels = [str(i) for i in range(len(labeltext))]

    Z1 = sch.dendrogram(
        Y, orientation="left", labels=dendrolabels, no_labels=not show_labels,
        get_leaves=True,
    )
    ax1.set_xticks([])

    # reorder matrix & labels by dendrogram leaf order
    leaf_order = Z1["leaves"]
    D = D[leaf_order, :][:, leaf_order]
    labeltext = [labeltext[idx] for idx in leaf_order]

    xstart = _MATRIX_X[bool(show_labels)]
    axmatrix = fig.add_axes([xstart, 0.1, _MATRIX_WIDTH, 0.6])
    im = axmatrix.matshow(
        D, aspect="auto", origin="lower", cmap=pylab.cm.YlGnBu, vmin=vmin, vmax=vmax
    )
    axmatrix.set_xticks([])
    axmatrix.set_yticks([])

    axcolor = fig.add_axes([xstart + _MATRIX_WIDTH + 0.01, 0.1, 0.02, 0.6])
    pylab.colorbar(im, cax=axcolor)

    return fig, labeltext, D
