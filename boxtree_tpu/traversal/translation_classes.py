"""Translation and rotation classes for M2L interactions.

Counterparts of ``boxtree/translation_classes.py`` and
``boxtree/rotation_classes.py``:

- :class:`TranslationClassesBuilder`: classifies every List-2 (M2L) box
  pair by its integer translation vector, giving a dense class id in
  ``[0, (4n+3)^d)`` (per level if requested).  With integer box cells
  this is pure arithmetic — the reference reconstructs the vector from
  float centers (``translation_classes.py:65-125``).
- :class:`RotationClassesBuilder`: maps translation classes to rotation
  classes (GCD-normalized directions) and z-axis angles for
  point-and-shoot M2L (``rotation_classes.py:90-196``).
"""

from __future__ import annotations

import numpy as np

from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import tree_dataclass


@tree_dataclass(meta=("nclasses_per_level",))
class TranslationClassesInfo:
    """Mirrors ``boxtree/translation_classes.py:194-241``.

    .. attribute:: from_sep_siblings_translation_classes

        ``int32 [nedges]`` — class of every List-2 entry.

    .. attribute:: from_sep_siblings_translation_class_to_distance_vector

        ``coord_t [dimensions, nclasses]`` — translation vector
        (target center - source center) of each class.

    .. attribute:: translation_classes_level_starts

        class-id range per level (classes are numbered per level).
    """

    traversal: object
    from_sep_siblings_translation_classes: object
    from_sep_siblings_translation_class_to_distance_vector: object
    translation_classes_level_starts: object
    nclasses_per_level: int


class TranslationClassesBuilder:
    """Builds :class:`TranslationClassesInfo`; mirrors
    ``boxtree/translation_classes.py:244-438``."""

    def __init__(self, actx=None):
        pass

    def __call__(self, trav_or_actx, trav=None, tree=None,
                 is_translation_per_level=True):
        if trav is None or not hasattr(trav, "tree"):
            trav = trav_or_actx
        tree = trav.tree
        d = tree.dimensions
        n = trav.well_sep_is_n_away
        width = 4 * n + 3
        half = 2 * n + 1
        nclasses_per_level = width ** d

        cells = np.asarray(morton.deinterleave(tree.box_morton_prefixes, d))
        levels = np.asarray(tree.box_levels)
        totp = np.asarray(trav.target_or_target_parent_boxes)
        starts = np.asarray(trav.from_sep_siblings_starts)
        lists = np.asarray(trav.from_sep_siblings_lists)
        counts = np.diff(starts)
        rows = np.repeat(np.arange(len(counts)), counts)
        tgt = totp[rows]
        src = lists

        dvec = (cells[:, tgt] - cells[:, src]).T        # (nedges, d)
        assert (np.abs(dvec) <= half).all()
        weights = width ** np.arange(d)
        cls = (dvec + half) @ weights
        lev = levels[tgt]
        if is_translation_per_level:
            cls = cls + lev.astype(np.int64) * nclasses_per_level
            nlevels = tree.nlevels
        else:
            nlevels = 1

        # distance vectors per class (in physical units, per level)
        root = float(np.asarray(tree.root_extent))
        nclasses = nclasses_per_level * nlevels
        dist = np.zeros((d, nclasses))
        ks = np.arange(width ** d)
        base = np.stack(
            [(ks // (width ** a)) % width - half for a in range(d)],
            axis=0).astype(np.float64)
        for lev_i in range(nlevels):
            size = root / (1 << lev_i) if is_translation_per_level else 1.0
            dist[:, lev_i * nclasses_per_level:
                 (lev_i + 1) * nclasses_per_level] = base * size

        import jax.numpy as jnp
        return TranslationClassesInfo(
            traversal=trav,
            from_sep_siblings_translation_classes=jnp.asarray(
                cls.astype(np.int32)),
            from_sep_siblings_translation_class_to_distance_vector=(
                jnp.asarray(dist)),
            translation_classes_level_starts=jnp.asarray(
                np.arange(nlevels + 1) * nclasses_per_level),
            nclasses_per_level=nclasses_per_level)


@tree_dataclass(meta=("nclasses",))
class RotationClassesInfo:
    """Mirrors ``boxtree/rotation_classes.py:55-87``.

    .. attribute:: from_sep_siblings_rotation_classes

        ``int32 [nedges]`` — rotation class of every List-2 entry.

    .. attribute:: from_sep_siblings_rotation_class_to_angle

        ``coord_t [nclasses]`` — angle to the +z axis of each class.
    """

    traversal: object
    from_sep_siblings_rotation_classes: object
    from_sep_siblings_rotation_class_to_angle: object
    nclasses: int


class RotationClassesBuilder:
    """Maps M2L translation directions to rotation classes
    (GCD-normalized integer directions; mirrors
    ``boxtree/rotation_classes.py:90-196``)."""

    def __init__(self, actx=None):
        pass

    def __call__(self, trav_or_actx, trav=None, tree=None):
        if trav is None or not hasattr(trav, "tree"):
            trav = trav_or_actx
        tree = trav.tree
        d = tree.dimensions

        cells = np.asarray(morton.deinterleave(tree.box_morton_prefixes, d))
        totp = np.asarray(trav.target_or_target_parent_boxes)
        starts = np.asarray(trav.from_sep_siblings_starts)
        lists = np.asarray(trav.from_sep_siblings_lists)
        counts = np.diff(starts)
        rows = np.repeat(np.arange(len(counts)), counts)
        dvec = (cells[:, totp[rows]] - cells[:, lists]).T  # (nedges, d)

        # normalize by per-edge gcd
        g = np.gcd.reduce(np.abs(dvec), axis=1)
        g = np.where(g == 0, 1, g)
        norm = dvec // g[:, None]

        uniq, cls = np.unique(norm, axis=0, return_inverse=True)
        if d == 3:
            angles = np.arccos(
                uniq[:, 2] / np.linalg.norm(uniq, axis=1))
        else:
            angles = np.arctan2(uniq[:, 1] if d > 1 else 0.0, uniq[:, 0])

        import jax.numpy as jnp
        return RotationClassesInfo(
            traversal=trav,
            from_sep_siblings_rotation_classes=jnp.asarray(
                cls.astype(np.int32)),
            from_sep_siblings_rotation_class_to_angle=jnp.asarray(angles),
            nclasses=len(uniq))
