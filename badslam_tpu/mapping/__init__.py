from badslam_tpu.mapping.association import (  # noqa: F401
    Association,
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import (  # noqa: F401
    ACTIVE,
    COVISIBLE_ACTIVE,
    INACTIVE,
    KeyframeStack,
    KeyframeStore,
)
from badslam_tpu.mapping.surfels import (  # noqa: F401
    SurfelMap,
    compact_surfels,
    create_surfels_for_keyframe,
    delete_surfels_and_update_radii,
    empty_map,
    merge_surfels_for_frame,
    update_surfel_activation,
)
