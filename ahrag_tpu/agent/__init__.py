from ahrag_tpu.agent.agent import AHRAG_Agent, run_agent_once
from ahrag_tpu.agent.environment import GraphEnvironment
from ahrag_tpu.agent.featurizer import OBS_DIM, featurize_observation
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.agent.inference import InferenceEngine, pick_top_ids
from ahrag_tpu.agent.reward import final_reward, step_reward
