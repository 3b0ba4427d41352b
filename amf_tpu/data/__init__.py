from amf_tpu.data.synthetic import (  # noqa: F401
    make_fake_data,
    get_ratings_mask,
    gen_known_diag_counts,
    known_diag,
)
from amf_tpu.data.splits import (  # noqa: F401
    pick_ratings,
    pick_ratings_drugbank,
    choose_test_set,
    make_split,
    make_new_items_split,
)
from amf_tpu.data.loaders import load_npz_schema, save_npz_schema  # noqa: F401
