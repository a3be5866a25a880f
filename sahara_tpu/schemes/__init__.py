from sahara_tpu.schemes.types import Search, Scheme, is_valid, is_complete, is_non_redundant
from sahara_tpu.schemes.expand import expand, expand_count, limit_to_hamming
from sahara_tpu.schemes.generators import GENERATORS, get_generator
from sahara_tpu.schemes.costs import node_count, weighted_node_count
