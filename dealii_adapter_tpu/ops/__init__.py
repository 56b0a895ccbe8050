from .element_ops import (  # noqa: F401
    AssembledOperator,
    ElementMatrices,
    FaceLoading,
    apply_plan,
    assemble_dense,
    body_force_vector,
    make_face_loading,
    make_operator,
)
