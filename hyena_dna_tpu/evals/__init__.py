from hyena_dna_tpu.evals.soft_prompting import SoftPromptModel, tune_soft_prompt

__all__ = ["SoftPromptModel", "tune_soft_prompt"]
