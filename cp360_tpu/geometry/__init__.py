from cp360_tpu.geometry.sph import (
    FACE_B,
    FACE_D,
    FACE_F,
    FACE_L,
    FACE_R,
    FACE_T,
    FACE_NAMES,
    rotx,
    roty,
    rotz,
    rotation_matrix,
    xy2angle,
    to_3dsphere,
    pruned_inf,
    get_face,
    face_to_cube_coord,
    norm_to_cube,
)
from cp360_tpu.geometry.equi_cube import (
    build_equi2cube_maps,
    build_cube2equi_map,
)
