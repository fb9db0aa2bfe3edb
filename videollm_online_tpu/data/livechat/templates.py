"""User-query templates for live-chat dialogue synthesis.

The reference ships ~200 paraphrases in four intents — asking about the
past, the current moment, the future, and casual small talk
(data/livechat/templates.py:5-162). Same structure here with our own
paraphrase bank; extend freely, synthesis samples uniformly."""

PAST_QUERIES = [
    "What did I just do?",
    "Can you recap what happened so far?",
    "What have I finished up to now?",
    "Summarize my previous actions.",
    "What was the last step I completed?",
    "Tell me what you have seen me do.",
    "What happened before this moment?",
    "Which steps are already done?",
    "Remind me what I did earlier.",
    "Briefly list what has been done.",
]

CURRENT_QUERIES = [
    "What am I doing now?",
    "Describe the current action.",
    "What is happening at the moment?",
    "What do you see right now?",
    "Which step am I on?",
    "Explain the present activity.",
    "What's going on in the video now?",
    "Tell me about the ongoing action.",
    "What task am I working on currently?",
    "Narrate the current scene.",
]

NEXT_QUERIES = [
    "What should I do next?",
    "What is the next step?",
    "What comes after this?",
    "Guide me through the following action.",
    "What do I need to prepare for the next step?",
    "Any advice for what to do now?",
    "What's the upcoming action?",
    "How should I continue?",
    "What remains to be done?",
    "Walk me through the rest of the task.",
]

CASUAL_QUERIES = [
    "Hello! Are you there?",
    "Thanks for the help!",
    "Do you like watching me cook?",
    "How is your day going?",
    "Are you able to see my video?",
    "You're doing great, assistant.",
    "Can you hear me?",
    "Just checking in.",
    "What do you think about this activity?",
    "Nice weather today, right?",
]

ALL_QUERY_TEMPLATES = (PAST_QUERIES + CURRENT_QUERIES + NEXT_QUERIES
                       + CASUAL_QUERIES)
