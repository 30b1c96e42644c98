"""Voxel map state: dense bounded grid and open-addressing hashed sparse grid."""

from sonar_3d_reconstruction_tpu.grid.dense import (  # noqa: F401
    DenseGridSpec,
    DenseGridState,
    init_dense_grid,
    update_dense_grid,
)


def check_state_backend(state, backend: str) -> None:
    """Raise ValueError when a resumed map ``state`` does not match ``backend``.

    The record key layout is chosen by the backend string while the apply
    dispatches on the state's type, so a mismatch (e.g. resuming a saved
    brick map without ``backend="brick"``) would silently write voxels
    through the wrong key interpretation instead of failing fast.
    ``state=None`` and backend strings without a single-chip state type
    (the sharded engines validate in their own wrappers) pass through.
    """
    if state is None:
        return
    # local imports keep ``import ...grid`` free of the hash/brick modules
    # for callers that only need the dense grid
    from sonar_3d_reconstruction_tpu.grid.brick import BrickGridState
    from sonar_3d_reconstruction_tpu.grid.hash import HashGridState

    expected = {
        "hash": HashGridState,
        "brick": BrickGridState,
        "dense": DenseGridState,
    }.get(backend)
    if expected is not None and not isinstance(state, expected):
        raise ValueError(
            f"map state {type(state).__name__} does not match "
            f"backend={backend!r} (expected {expected.__name__}); pass the "
            f"matching backend= when resuming a saved map"
        )
