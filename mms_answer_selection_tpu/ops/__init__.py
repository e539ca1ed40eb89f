from .similarity import (  # noqa: F401
    sim_cross_cosine,
    sim_cross_inv_euclidean,
    sim_cross_bilinear,
    sim_matrix,
    fm_pool,
)
from .batch_norm import bn_init, bn_apply  # noqa: F401
from .conv import conv2d, conv_init  # noqa: F401
from .pooling import (  # noqa: F401
    avg_pool2d,
    max_pool2d,
    pool2d_padded,
    spatial_pyramid_pool,
    stochastic_pool2d,
)
from .embed import embed_init, embed_lookup, load_pretrained_vectors  # noqa: F401
from .losses import (  # noqa: F401
    softmax_cross_entropy,
    pair_rank_loss,
    sigmoid_cross_entropy,
    euclidean_loss,
    hinge_loss,
    contrastive_loss,
    multinomial_logistic_loss,
    infogain_loss,
)
from .dropout import dropout  # noqa: F401
