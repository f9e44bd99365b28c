from .a_score import a_score, a_score_pairwise, max_cos_similarity
