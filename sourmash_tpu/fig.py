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


def load_matrix_and_labels(basefile):
    "Load the comparison matrix and associated labels, return (D, labels)."
    import numpy

    D = numpy.load(open(basefile, "rb"))
    labeltext = [x.strip() for x in open(basefile + ".labels.txt")]
    return (D, labeltext)


def plot_composite_matrix(
    D, labeltext, show_labels=True, vmax=1.0, vmin=0.0, force=False
):
    """Build a composite plot: dendrogram + distance matrix/heatmap.

    Returns a matplotlib figure, plus reordered labels and matrix."""
    if D.max() > 1.0 or D.min() < 0.0:
        error(
            "This matrix doesn't look like a distance matrix - min value {}, max value {}",
            D.min(),
            D.max(),
        )
        if not force:
            raise ValueError("not a distance matrix")
        else:
            notify("force is set; scaling to [0, 1]")
            D -= D.min()
            D /= D.max()

    if show_labels:
        pass
    else:
        labeltext = [""] * len(labeltext)

    fig = pylab.figure(figsize=(11, 8))
    ax1 = fig.add_axes([0.09, 0.1, 0.2, 0.6])

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

    xstart = 0.45
    width = 0.45
    if not show_labels:
        xstart = 0.315
    scale_xstart = xstart + width + 0.01

    idx1 = Z1["leaves"]

    # reorder matrix & labels
    D = D[idx1, :]
    D = D[:, idx1]
    labeltext = [labeltext[idx] for idx in idx1]

    axmatrix = fig.add_axes([xstart, 0.1, width, 0.6])
    im = axmatrix.matshow(
        D, aspect="auto", origin="lower", cmap=pylab.cm.YlGnBu, vmin=vmin, vmax=vmax
    )
    axmatrix.set_xticks([])
    axmatrix.set_yticks([])

    axcolor = fig.add_axes([scale_xstart, 0.1, 0.02, 0.6])
    pylab.colorbar(im, cax=axcolor)

    return fig, labeltext, D
