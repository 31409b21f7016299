"""Language-ID accuracy gate (VERDICT r2 'next round' #8).

The driver fixture's `lang` labels cannot gate a language classifier —
its text is language-independent synthetic word salad (a word-frequency
naive-Bayes fit on the fixture itself only reaches ~0.37 against those
labels), so accuracy is gated here on genuinely multilingual sentences:
the SPARK implementation (__spark_entry__._langid_over, the same
expression tree the twinned contract query uses) must label >= 0.95 of
them correctly across the five fixture languages."""

import pandas as pd

SENTENCES = {
    "en": [
        "The quick brown fox jumps over the lazy dog near the river bank.",
        "She was reading a book about the history of science and nature.",
        "We should think carefully before making any important decision.",
        "The weather this morning is cold and the wind is blowing hard.",
        "Everything that could go wrong went wrong during the first test.",
        "He found the missing keys under the table in the living room.",
        "Learning new things every day keeps the mind sharp and healthy.",
        "The committee agreed to postpone the meeting until next week.",
        "A long walk along the beach is the best way to clear your head.",
        "They have been working on this project for more than three years.",
        "Most of the students finished the exam before the time was over.",
        "The old library at the corner of the street is closing down soon.",
    ],
    "de": [
        "Der schnelle braune Fuchs springt über den faulen Hund im Garten.",
        "Sie las ein Buch über die Geschichte der Wissenschaft und Natur.",
        "Wir sollten gründlich nachdenken, bevor wir eine Entscheidung treffen.",
        "Das Wetter heute Morgen ist kalt und der Wind weht sehr stark.",
        "Alles, was schiefgehen konnte, ging beim ersten Versuch schief.",
        "Er fand die verlorenen Schlüssel unter dem Tisch im Wohnzimmer.",
        "Jeden Tag etwas Neues zu lernen hält den Geist wach und gesund.",
        "Der Ausschuss beschloss, die Sitzung auf nächste Woche zu verschieben.",
        "Ein langer Spaziergang am Strand ist die beste Art zu entspannen.",
        "Sie arbeiten seit mehr als drei Jahren an diesem großen Projekt.",
        "Die meisten Studenten beendeten die Prüfung vor Ablauf der Zeit.",
        "Die alte Bibliothek an der Straßenecke wird bald geschlossen.",
    ],
    "es": [
        "El rápido zorro marrón salta sobre el perro perezoso del jardín.",
        "Ella estaba leyendo un libro sobre la historia de la ciencia.",
        "Deberíamos pensar con cuidado antes de tomar una decisión importante.",
        "El clima de esta mañana es frío y el viento sopla con fuerza.",
        "Todo lo que podía salir mal salió mal durante la primera prueba.",
        "Encontró las llaves perdidas debajo de la mesa de la sala.",
        "Aprender cosas nuevas cada día mantiene la mente sana y despierta.",
        "El comité acordó aplazar la reunión hasta la próxima semana.",
        "Un largo paseo por la playa es la mejor manera de despejarse.",
        "Llevan trabajando en este proyecto desde hace más de tres años.",
        "La mayoría de los estudiantes terminaron el examen antes de tiempo.",
        "La vieja biblioteca de la esquina cerrará sus puertas muy pronto.",
    ],
    "fr": [
        "Le rapide renard brun saute par-dessus le chien paresseux du jardin.",
        "Elle lisait un livre sur les histoires des sciences et de la nature.",
        "Nous devrions bien réfléchir avant de prendre une décision importante.",
        "Le temps ce matin est froid et le vent souffle très fort.",
        "Tout ce qui pouvait mal tourner a mal tourné pendant le premier essai.",
        "Il a trouvé les clés perdues sous la table du salon.",
        "Apprendre de nouvelles choses chaque jour garde un esprit vif.",
        "Le comité a décidé de reporter la réunion à la semaine prochaine.",
        "Une longue promenade sur la plage est le meilleur moyen de se détendre.",
        "Ils travaillent sur ce projet depuis plus de trois années déjà.",
        "La plupart des étudiants ont terminé les épreuves avant la fin.",
        "La vieille bibliothèque au coin de la rue fermera bientôt ses portes.",
    ],
    "zh": [
        "敏捷的棕色狐狸跳过了花园里那只懒惰的狗。",
        "她正在读一本关于科学和自然历史的书。",
        "我们在做出重要决定之前应该仔细思考。",
        "今天早上的天气很冷，风刮得很大。",
        "第一次测试中所有可能出错的地方都出错了。",
        "他在客厅的桌子下面找到了丢失的钥匙。",
        "每天学习新东西能让头脑保持敏锐和健康。",
        "委员会同意把会议推迟到下个星期。",
        "沿着海滩散步是放松心情的最好方式。",
        "他们已经在这个项目上工作了三年多。",
        "大多数学生在时间结束前完成了考试。",
        "街角的那座老图书馆很快就要关闭了。",
    ],
}


def test_langid_accuracy_on_multilingual_sentences(spark):
    import __spark_entry__ as e

    rows = [
        {"lang": lang, "text": s}
        for lang, sents in SENTENCES.items()
        for s in sents
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = e._langid_over(df).toPandas()
    acc = (got["pred_lang"] == got["lang"]).mean()
    misses = got[got["pred_lang"] != got["lang"]]
    assert acc >= 0.95, f"accuracy {acc:.3f}; misses:\n{misses}"


def test_langid_unknown_when_no_marker_fires(spark):
    import __spark_entry__ as e

    df = spark.createDataFrame(pd.DataFrame([{"text": "xxxx zzzz qqqq"}]))
    assert e._langid_over(df).collect()[0]["pred_lang"] == "unknown"
