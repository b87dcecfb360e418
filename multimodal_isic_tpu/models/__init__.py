from .convmae import ConvMAE, convmae_convvit_base_patch16_dec512d8b  # noqa: F401
from .efficientnet import EfficientNet, feature_dim, port_torch_state_dict  # noqa: F401
from .fusion import AttentionFusion, AttentionFusionLate, MultiModalFusionNet  # noqa: F401
from .mil import AttentionMIL, mil_loss  # noqa: F401
from .graph_mil import GraphMIL  # noqa: F401
from .graphs import (build_graph, build_grid_adj, build_grid_adj_dynamic,  # noqa: F401
                     build_knn_adj, build_random_adj)
