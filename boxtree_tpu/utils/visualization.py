"""Tree and interaction-list visualization (matplotlib).

Counterpart of ``boxtree/visualization.py``: :class:`TreePlotter` draws
box outlines / numbers (``visualization.py:58-171``) and
:func:`draw_box_lists` overlays a box's interaction lists
(``visualization.py:229-276``).
"""

from __future__ import annotations

import numpy as np


class TreePlotter:
    """Assumes that the tree (or tree of boxes) is 2D."""

    def __init__(self, tree):
        if tree.dimensions != 2:
            raise ValueError("TreePlotter supports 2D trees only")
        self.tree = tree
        self.centers = np.asarray(tree.box_centers)
        self.levels = np.asarray(tree.box_levels)
        self.root_extent = float(np.asarray(tree.root_extent))

    def box_extent(self, ibox):
        size = self.root_extent / (1 << int(self.levels[ibox]))
        lo = self.centers[:, ibox] - size / 2
        return lo, size

    def draw_box(self, ibox, ax=None, **kwargs):
        import matplotlib.patches as mpatches
        import matplotlib.pyplot as plt
        ax = ax or plt.gca()
        lo, size = self.box_extent(ibox)
        kwargs.setdefault("fill", False)
        ax.add_patch(mpatches.Rectangle(lo, size, size, **kwargs))

    def draw_tree(self, ax=None, **kwargs):
        import matplotlib.pyplot as plt
        ax = ax or plt.gca()
        kwargs.setdefault("edgecolor", "black")
        kwargs.setdefault("linewidth", 0.4)
        for ibox in range(self.tree.nboxes):
            self.draw_box(ibox, ax=ax, **kwargs)

    def set_bounding_box(self, ax=None):
        import matplotlib.pyplot as plt
        ax = ax or plt.gca()
        lo, hi = self.tree.bounding_box
        lo, hi = np.asarray(lo), np.asarray(hi)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_aspect("equal")

    def draw_box_numbers(self, ax=None):
        import matplotlib.pyplot as plt
        ax = ax or plt.gca()
        for ibox in range(self.tree.nboxes):
            ax.text(self.centers[0, ibox], self.centers[1, ibox],
                    str(ibox), ha="center", va="center", fontsize=6)

    def get_tikz_for_tree(self):
        """TikZ export (mirrors ``visualization.py:146-171``)."""
        lines = [r"\begin{tikzpicture}"]
        for ibox in range(self.tree.nboxes):
            lo, size = self.box_extent(ibox)
            lines.append(
                rf"\draw ({lo[0]:.6g},{lo[1]:.6g}) rectangle "
                rf"({lo[0] + size:.6g},{lo[1] + size:.6g});")
        lines.append(r"\end{tikzpicture}")
        return "\n".join(lines)


def draw_box_lists(plotter, traversal, ibox, ax=None):
    """Highlight box *ibox* and overlay its Lists 1/2/3/4
    (mirrors ``boxtree/visualization.py:229-276``)."""
    import matplotlib.pyplot as plt
    ax = ax or plt.gca()
    plotter.draw_box(ibox, ax=ax, facecolor="red", fill=True, alpha=0.5)

    tgt_row = np.nonzero(
        np.asarray(traversal.target_boxes) == ibox)[0]
    totp_row = np.nonzero(
        np.asarray(traversal.target_or_target_parent_boxes) == ibox)[0]

    def overlay(starts, lists, row, color):
        if len(row) == 0:
            return
        starts = np.asarray(starts)
        lists = np.asarray(lists)
        r = int(row[0])
        for b in lists[starts[r]:starts[r + 1]]:
            plotter.draw_box(int(b), ax=ax, facecolor=color, fill=True,
                             alpha=0.3)

    overlay(traversal.neighbor_source_boxes_starts,
            traversal.neighbor_source_boxes_lists, tgt_row, "blue")
    overlay(traversal.from_sep_siblings_starts,
            traversal.from_sep_siblings_lists, totp_row, "green")
    overlay(traversal.from_sep_bigger_starts,
            traversal.from_sep_bigger_lists, totp_row, "purple")
    for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
        if ssn.count == 0:
            continue
        tb = np.asarray(
            traversal.target_boxes_sep_smaller_by_source_level[lvl])
        row = np.nonzero(tb == ibox)[0]
        overlay(ssn.starts, ssn.lists, row, "orange")
